package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed k-means over the embedding column — the corpus-clustering
  * step a training-data pipeline runs for curation at scale (cluster
  * then inspect/balance/dedup per cluster; SemDeDup and density-based
  * pruning both start from exactly this clustering).
  *
  * Contrast with [[Similarity.trainIvfCentroids]]: the IVF quantizer
  * deliberately trains on a BOUNDED driver-side sample (its model only
  * routes probes). This is the full-corpus Lloyd's iteration — every
  * vector votes in every round — for when cluster QUALITY is the
  * product, executed as Spark aggregations so it scales with the
  * cluster, not the driver.
  */
object Clustering {

  /** Full-corpus Lloyd's k-means, distributed:
    *
    *  - init: the embeddings of the k smallest vec_ids (deterministic,
    *    no RNG — runs and replays agree; k rows collected).
    *  - assignment: nearest-centroid argmin as a narrow map over the
    *    corpus (broadcast k×dim doubles in the UDF closure).
    *  - update: per-(cell, dimension) sums via posexplode + hash
    *    aggregation — map-side partials reduce every partition to
    *    ≤ k×dim rows BEFORE the exchange, so the shuffle carries
    *    O(k × dim × partitions) regardless of corpus size; the driver
    *    receives exactly k×dim (cell, dim, sum, count) rows per
    *    iteration (~a few KB), the textbook distributed-k-means sync.
    *
    * Cost: `iters` corpus passes + one k-row collect; per-iteration
    * driver traffic is k×dim doubles. Empty cells keep their previous
    * centroid (no respawn — deterministic). This is an eager model-
    * fitting call (it RUNS Spark jobs), not a lazy query builder —
    * callers embedding it in a query ([[kmeansStats]]) pay the fit at
    * build time by design, exactly like [[Similarity.trainIvfCentroids]].
    */
  def kmeansCentroids(emb: DataFrame, k: Int = 8, iters: Int = 4): Array[Array[Double]] = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got $k, $iters")
    var cents: Array[Array[Double]] = emb.filter(col("embedding").isNotNull)
      .orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.length == k, s"need >= $k non-null vectors, got ${cents.length}")
    for (_ <- 0 until iters) {
      val assigned = emb.filter(col("embedding").isNotNull)
        .select(Similarity.ivfCellUdf(cents)(col("embedding")).as("cell"),
          col("embedding"))
      val rows = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("c"))
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val (cell, dim) = (r.getInt(0), r.getInt(1))
        next(cell)(dim) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** Cluster-level audit of a fitted k-means: size, inertia (sum of
    * squared distances to the assigned centroid), and mean squared
    * distance per cluster — the numbers a curation pipeline reads to
    * pick which clusters to prune, balance, or inspect. One narrow
    * assignment map + one k-row aggregation; floats are engine-local
    * (rows-only correctness check, like the other cosine/L2 queries).
    */
  def kmeansStats(spark: SparkSession, d: String,
                  k: Int = 8, iters: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    val cents = kmeansCentroids(emb, k, iters)
    assigned(emb, cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("d2")), 6).as("inertia"),
        round(avg(col("d2")), 6).as("mean_sq_dist"))
      .orderBy(col("cluster"))
  }

  /** Cluster-based pruning (the D4 / SSL-prototypes curation move,
    * Tirumala et al. 2023): within each k-means cluster, DROP the most
    * prototypical `dropFrac` of vectors — the ones closest to their
    * centroid carry the least marginal information, so pruning them
    * first preserves diversity at a given data budget (the opposite
    * keep-rule of [[Similarity.semanticDedup]], which drops near-DUPS;
    * the two compose: dedup first, then density-prune).
    *
    * Drop rule: rank within cluster by (squared distance ASC, vec_id)
    * and drop ranks <= floor(dropFrac × cluster size) — deterministic,
    * no RNG, exact per-cluster proportions. Output is the per-cluster
    * audit (sizes, drops, the distance at the cut) plus totals a
    * pipeline uses to confirm the prune hit its budget.
    *
    * Scale shape: assignment + distance are the narrow map; ranking is
    * ONE window shuffle keyed on the cluster id over (cluster, d2,
    * vec_id) rows — 24 bytes per VECTOR, not per dimension. With k
    * clusters over a 100 TB corpus the window partitions are corpus/k
    * sized; derive k from corpus size (as semantic dedup derives nlist)
    * if a single cluster would exceed a task's memory for the sort.
    */
  def clusterPrune(spark: SparkSession, d: String,
                   k: Int = 8, iters: Int = 4,
                   dropFrac: Double = 0.25): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac <= 1.0, s"dropFrac in [0,1], got $dropFrac")
    val emb = Tables.embeddings(spark, d)
    val cents = kmeansCentroids(emb, k, iters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    assigned(emb, cents, keepId = true)
      .withColumn("rk", row_number().over(w))
      .withColumn("cluster_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))))
      .withColumn("dropped", col("rk") <= floor(lit(dropFrac) * col("cluster_n")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("dropped").cast("long")).as("n_dropped"),
        round(max(when(col("dropped"), col("d2"))), 6).as("cut_d2"),
        round(avg(col("d2")), 6).as("mean_d2"))
      .orderBy(col("cluster"))
  }

  /** Streaming assignment monitor (foreachBatch stage): score each
    * micro-batch of vectors against a FIXED fitted model (the
    * train-offline / serve-online split every production clusterer
    * uses) and append the per-batch cell histogram — cell, count, mean
    * squared distance — tagged with the batch id. A shift in this
    * histogram over batches is the drift alarm that triggers a re-fit.
    * Assignment is per-vector (narrow map, no cross-batch state), so
    * the batch-mode histogram on the same vectors equals the
    * column-wise union of per-batch histograms (asserted in
    * StreamingSpec) — the batch/streaming symmetry contract.
    */
  def assignmentSink(vecStream: DataFrame, cents: Array[Array[Double]],
                     outPath: String, checkpoint: String,
                     triggerMs: Long = 10000L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecStream.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batchHistogram(batch, cents)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outPath)
        }
      }

  /** Cell histogram of one (vec_id, embedding) frame under fixed
    * centroids — shared by [[assignmentSink]] and its batch-parity test.
    */
  def batchHistogram(vecs: DataFrame, cents: Array[Array[Double]]): DataFrame =
    assigned(vecs, cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"), round(avg(col("d2")), 6).as("mean_sq_dist"))

  /** (cluster, d2) assignment frame under fixed centroids — ONE fused
    * kernel pass (argmin cell and its squared distance fall out of the
    * same centroid loop; separate cell/distance UDFs would double the
    * dominant O(k×dim) per-vector cost of every consumer).
    */
  private def assigned(vecs: DataFrame, cents: Array[Array[Double]],
                       keepId: Boolean = false): DataFrame = {
    val a = assignUdf(cents)(col("embedding"))
    val base = vecs.filter(col("embedding").isNotNull)
    if (keepId)
      base.select(col("vec_id"), a.getField("_1").as("cluster"),
        a.getField("_2").as("d2"))
    else
      base.select(a.getField("_1").as("cluster"), a.getField("_2").as("d2"))
  }

  /** Fused nearest-centroid kernel: (argmin cell, squared distance) in
    * one loop over the centroids (ties to the lower cell, matching
    * [[Similarity.ivfCellUdf]]).
    */
  private def assignUdf(cents: Array[Array[Double]]) =
    udf { v: scala.collection.Seq[Float] =>
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val ctr = cents(c)
        var d = 0.0
        var i = 0
        val n = math.min(ctr.length, v.length)
        while (i < n) { val x = v(i) - ctr(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (best, bestD)
    }
}

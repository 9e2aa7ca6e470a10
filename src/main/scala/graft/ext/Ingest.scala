package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The STREAMING INGEST GATE: every frozen-base admission artifact this
  * library builds, composed into ONE verdict row per arriving document
  * — the single sink a recurring crawl actually runs in front of its
  * training corpus. Per arrival: the three dedup-cascade verdicts
  * (canonical URL, exact content hash, MinHash near-dup), the
  * offset-robust CDC owned-token fraction, the model quality gate, and
  * the final `admitted` bit (no dup fired, CDC ownership under 50 %,
  * quality passed).
  *
  * Why one gate instead of five sinks: the five artifacts freeze under
  * ONE checkpoint scope (a single [[Freeze]] lifecycle — the listener
  * releases them together when the stream stops), the batch reads the
  * corpus ONCE per stage family, and the verdict matrix is what the
  * operator actually wants — WHICH gate fired, not five disjoint
  * outputs to re-join downstream. The production sequencing
  * optimization (gate stage N+1 on stage N's survivors to save
  * compute) is the [[Dedup.dedupCascade]] scaladoc's trade; the audit
  * form computes all verdicts so the stage-overlap is measurable.
  *
  * Scale shape: each verdict is its Against operator unchanged — one
  * keyed probe join per artifact, probe work proportional to the
  * batch, never |batch| × |base| — and the matrix assembles through
  * doc_id-keyed left joins on the BATCH side only.
  */
object Ingest {

  /** All five frozen-base artifacts of a static base corpus, built
    * once: canonical-URL keepers, content-hash keepers, MinHash band
    * index, CDC chunk keepers. (The quality gate is stateless.)
    */
  private[ext] def artifacts(base: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    (Cleaning.keeperCanonUrls(Dedup.cascadeUrls(base)),
      Dedup.keeperContentHashes(base),
      Dedup.minhashBandIndex(base),
      Corpus.keeperChunkFingerprints(base))

  /** The per-arrival verdict matrix against pre-built artifacts; see
    * the object scaladoc. Columns: doc_id, url_dup, exact_dup,
    * near_dup, cdc_owned_frac, quality_pass, admitted.
    */
  def gateAgainst(arrivals: DataFrame,
                  urlKeepers: DataFrame, contentKeepers: DataFrame,
                  bandIndex: DataFrame, chunkKeepers: DataFrame): DataFrame = {
    val urlV = Cleaning.urlDedupAgainst(Dedup.cascadeUrls(arrivals), urlKeepers)
      .select(col("doc_id"), col("dup").as("url_dup"))
    val exactV = Dedup.exactDedupAgainst(arrivals, contentKeepers)
      .select(col("doc_id"), col("dup").as("exact_dup"))
    val nearV = Dedup.minhashNearDupsAgainst(arrivals, bandIndex)
      .select(col("id_new").as("doc_id")).distinct()
      .withColumn("near_dup", lit(true))
    val cdcV = org.apache.spark.sql.GraftSql.unordered(
        Corpus.cdcContainmentAgainst(arrivals, chunkKeepers))
      .select(col("doc_id"), col("owned_frac").as("cdc_owned_frac"))
    val qV = arrivals.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        (TextAnalysis.qualityScoreCol >= 0.5).as("quality_pass"))
    arrivals.filter(col("text").isNotNull).select(col("doc_id"))
      .join(urlV, Seq("doc_id"), "left")
      .join(exactV, Seq("doc_id"), "left")
      .join(nearV, Seq("doc_id"), "left")
      .join(cdcV, Seq("doc_id"), "left")
      .join(qV, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("url_dup"), lit(false)).as("url_dup"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("near_dup"),
        coalesce(col("cdc_owned_frac"), lit(0.0)).as("cdc_owned_frac"),
        coalesce(col("quality_pass"), lit(false)).as("quality_pass"))
      .withColumn("admitted",
        !col("url_dup") && !col("exact_dup") && !col("near_dup") &&
          col("cdc_owned_frac") < 0.5 && col("quality_pass"))
      .orderBy(col("doc_id"))
  }

  /** Registered composition: the snapshot/delta split (doc_id % 4 == 0
    * arrives) through the full gate. The three dedup verdict columns
    * are definitionally identical to [[Dedup.dedupCascade]]'s and the
    * CDC fraction to [[Corpus.cdcIncremental]]'s — asserted
    * column-for-column in IngestSpec.
    */
  def ingestGate(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 4 === 0)
    val (u, c, b, k) = artifacts(base)
    gateAgainst(arrivals, u, c, b, k)
  }

  /** Streaming form (foreachBatch stage): the four base artifacts
    * freeze under the sink's checkpoint scope in one lifecycle; each
    * micro-batch of arrivals appends its verdict matrix tagged with
    * the batch id.
    */
  def gateSink(docStream: DataFrame, baseDocs: DataFrame,
               outPath: String, checkpoint: String,
               triggerMs: Long = 10000L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val (u, c, b, k) = artifacts(baseDocs)
    val fu = Freeze.scoped(checkpoint, u)
    val fc = Freeze.scoped(checkpoint, c)
    val fb = Freeze.scoped(checkpoint, b)
    val fk = Freeze.scoped(checkpoint, k)
    docStream.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // per-batch presentation sort stripped (see Cleaning.spanDedupSink)
          org.apache.spark.sql.GraftSql.unordered(
            gateAgainst(batch, fu, fc, fb, fk))
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outPath)
        }
      }
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-up smoke: synthesizes an sf~1 dataset from sf0.1 (fact
  * tables replicated with key offsets; dimensions kept — the realistic
  * growth shape) and times the heaviest queries at both scales. A query
  * whose time grows superlinearly (≳12× at 10× data at fixed
  * parallelism) has a scale bug regardless of its absolute cost.
  *
  * Replica hygiene: document text is passed through a per-replica
  * letter substitution and embeddings are cyclically rotated, so
  * replicas are NOT textual/vector near-duplicates of the originals —
  * otherwise every dedup query would see c copies per content and its
  * candidate-pair stage would grow O(c²) BY CONSTRUCTION of the data,
  * not by any engine defect. Join keys (orderkey) offset consistently
  * on both sides; per-user/per-doc densities stay constant.
  *
  * Usage: runMain graft.tools.ScaleSmoke [srcDir] [workDir] [replicas]
  */
object ScaleSmoke {

  private val heavyQueries = Seq(
    "q1_pricing_summary", "q3_shipping", "q5_local_supplier",
    "q_lineitem_cube", "q_percentiles", "q_approx_distincts",
    "q_tfidf_top_terms", "q_minhash_pairs", "q_simhash_near_dups",
    "q_neardup_clusters", "q_session_stats", "q_hot_terms_exact",
    "q_ngram_jaccard" /* bounded kernel: must stay FLAT, not 10× */)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_sfx10")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.LocalSession.build()

    // resume guard checks EVERY table (a crash mid-synthesis must not
    // leave a half-built dataset that silently skips rebuilding)
    val allTables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    if (!allTables.forall(t => new java.io.File(s"$work/$t.parquet/_SUCCESS").exists())) {
      println(s"[scale] building ${replicas}x dataset at $work from $src")
      synthesize(spark, src, work, replicas)
    }

    def time(name: String, dir: String): Double = {
      System.gc()
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    // warm-up
    graft.SparkEntry.queries("q_domain_stats")(spark, src)
      .write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-22s ${"sf0.1"}%8s ${"x" + replicas}%8s ${"ratio"}%7s")
    heavyQueries.foreach { q =>
      val a = time(q, src)
      val b = time(q, work)
      println(f"$q%-22s $a%8.2f $b%8.2f ${b / a}%7.1f")
    }
    spark.stop()
  }

  /** Fact tables replicated with consistent key offsets; dims copied. */
  private def synthesize(spark: SparkSession, src: String, work: String,
                         replicas: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$work/$t.parquet")

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    def maxOf(t: String, c: String): Long =
      read(t).agg(max(col(c))).collect().head.getLong(0) + 1

    val mo = maxOf("orders", "o_orderkey")
    val me = maxOf("events", "event_id")
    val mu = maxOf("events", "user_id")
    val md = maxOf("documents", "doc_id")
    val mv = maxOf("embeddings", "vec_id")

    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until replicas).map(k => f(base, k)).reduce(_ unionAll _), t)
    }

    replicate("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * mo)) }
    replicate("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * mo)) }
    replicate("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * me))
        .withColumn("user_id", col("user_id") + lit(k * mu)) }
    // per-replica letter substitution: replicas diverge in shingle space
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    replicate("documents") { (df, k) =>
      val rot = alpha.drop(k * 2 % 26) + alpha.take(k * 2 % 26)
      df.withColumn("doc_id", col("doc_id") + lit(k * md))
        .withColumn("text", translate(col("text"), alpha, rot)) }
    // cyclic rotation: same norm, decorrelated directions across replicas
    replicate("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + lit(k * mv))
        .withColumn("embedding",
          if (k == 0) col("embedding")
          else concat(slice(col("embedding"), k + 1, 10000),
            slice(col("embedding"), 1, k))) }
  }
}

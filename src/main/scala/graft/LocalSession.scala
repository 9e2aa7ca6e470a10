package graft

import org.apache.spark.sql.SparkSession

/** The ONE local-session recipe shared by every main (Bench, Verify,
  * Probe, ScaleSmoke): same parallelism, shuffle partitioning, UTC
  * timezone, and the legacy nanos flag the fixture parquet requires.
  * Tools that diagnose the bench must run the bench's exact session
  * config — three hand-copied builder blocks had already started to
  * drift risk.
  */
object LocalSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString)

  def build(): SparkSession = {
    val n = cpus
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local NVMe has no per-file seek penalty worth 4 MB (the HDFS
      // default): without this, the artifact store's small files pack
      // into 1-2 scan partitions and every load pays a repartition
      // exchange to restore parallelism (ArtifactStore.load). 64 KB
      // lets a 32-file artifact split per file naturally. Cluster
      // deployments keep the default — this is the LOCAL recipe.
      .config("spark.sql.files.openCostInBytes", "65536")
      // Spark 4's DisableUnnecessaryBucketedScan drops bucket-aware
      // reads even when an In filter on the bucket key could PRUNE
      // buckets (no optionalBucketSet spare in the rule) — which
      // defeats the whole point of the bucketed ANN serve state
      // (Similarity.bucketedAnnState: a bounded candidate gather must
      // read bounded buckets). This repo only reads bucketed tables
      // where bucket-awareness is wanted (co-located joins, pruned
      // gathers), so auto-disable is turned off.
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // sink-pinned frozen tables release themselves when their stream
    // terminates (idempotent install; manual Freeze.release still works
    // for sinks constructed but never started)
    graft.ext.Freeze.autoRelease(spark)
    spark
  }
}

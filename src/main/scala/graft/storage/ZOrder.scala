package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-ORDER (Morton-curve) multi-dimensional layout for the events
  * table — the physical-layout optimization that lets BOTH a user
  * predicate AND a time-range predicate prune files at 100 TB. A
  * single-dimension sort gives one predicate perfect pruning and the
  * other none; interleaving the bits of (user, time) gives every
  * z-contiguous file a bounded range in BOTH dimensions (Morton 1966;
  * the curve behind Delta Lake's OPTIMIZE ZORDER and ClickHouse's
  * space-filling-curve indexes — public algorithm, original
  * implementation).
  *
  * Dimensions are first scaled to 8 bits over their OBSERVED extent
  * (a 2-scalar broadcast aggregate — the unigram scalar-N precedent),
  * so locality holds regardless of raw ranges (a 15-user fixture and
  * a 10^9-user production table interleave identically); the 16-bit
  * z-value then buckets by its top 10 bits. The registered audit
  * reports per-bucket extents — n_events, distinct users, user span,
  * time span — the numbers that ARE the pruning guarantee: a file
  * written per bucket serves a user-equality scan touching ~1/32 of
  * files and a time-range scan touching ~1/32, where a time-sorted
  * layout serves the former with a full scan. The write path this
  * audits is `repartitionByRange(col("z"))` + per-partition files;
  * the audit form stays a query so the oracle can check the curve
  * arithmetic bit-for-bit.
  *
  * Scale shape: one narrow pass computes micros + scaled dims + the
  * interleave (pure integer bit arithmetic, codegen'd), one
  * bucket-keyed map-side-combined aggregation; the extent aggregate
  * is 4 scalars broadcast back. Nothing corpus-sized shuffles except
  * the one bucket groupBy.
  */
object ZOrder {

  /** Bit-interleave two `bits`-wide non-negative columns: x takes the
    * even positions, y the odd — the Morton code.
    */
  def interleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k)
        .plus(shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ + _)

  def zorderEvents(spark: SparkSession, d: String): DataFrame =
    zorderEventsDf(Tables.events(spark, d))

  /** DataFrame form (events must have user_id + ts). */
  def zorderEventsDf(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), unix_micros(col("ts")).as("us"))
    val m = e.agg(
      min(col("user_id")).as("minu"), max(col("user_id")).as("maxu"),
      min(col("us")).as("minus"), max(col("us")).as("maxus"))
    // scale each dimension to 0..255 over its observed extent; the
    // double products stay far under 2^53, so floor is engine-exact
    def scaled(v: Column, lo: Column, hi: Column): Column =
      floor((v - lo).cast("double") * 256 / (hi - lo + 1).cast("double"))
        .cast("long")
    val z = e.crossJoin(broadcast(m))
      .withColumn("x", scaled(col("user_id"), col("minu"), col("maxu")))
      .withColumn("y", scaled(col("us"), col("minus"), col("maxus")))
      .withColumn("bucket", floor(interleave(col("x"), col("y"), 8)
        .cast("double") / 64).cast("long"))
    z.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (max(col("user_id")) - min(col("user_id"))).as("user_span"),
        (max(col("us")) - min(col("us"))).as("ts_span_us"))
      .orderBy(col("bucket"))
  }
}

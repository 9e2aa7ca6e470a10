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

  /** LAYOUT COMPARISON: the z-order claim as one table — the same
    * events bucketed 64 ways under three layouts (z-order, pure time
    * sort, pure user sort), each reporting its event-weighted mean
    * span as a FRACTION of the full range, per dimension. The fraction
    * IS the expected scan cost of a point/range predicate on that
    * dimension under that layout: a time sort reads ~1/64 of the data
    * for a time range and ~all of it for a user probe; z-order pays a
    * bounded fraction on BOTH. 64 buckets (6 z-bits / 6 scaled bits)
    * so buckets hold enough events for spans to mean something at
    * fixture scale.
    *
    * FP discipline: weighted span sums are exact integer products
    * (time spans in SECONDS so n·span stays far inside int64 — the
    * micros product would overflow), one double division at the end,
    * 6-dp snapped; summation order can't leak in.
    *
    * Scale shape: three narrow bucket assignments over one scan
    * lineage, each feeding a 64-group aggregate; extents broadcast.
    */
  def layoutCompare(spark: SparkSession, d: String): DataFrame =
    layoutCompareDf(Tables.events(spark, d))

  /** DataFrame form (events must have user_id + ts); see
    * [[layoutCompare]].
    */
  def layoutCompareDf(events: DataFrame): DataFrame = {
    // integer SECONDS end-to-end (unix_seconds / epoch_us // 1e6): the
    // weighted span sums then stay exact int64 products — micros would
    // put n·span near the long boundary, and a double span invites the
    // summation-order trap
    val e = events.select(col("user_id"), unix_seconds(col("ts")).as("sec"))
    val m = e.agg(
      min(col("user_id")).as("minu"), max(col("user_id")).as("maxu"),
      min(col("sec")).as("mins"), max(col("sec")).as("maxs"))
    val base = e.crossJoin(broadcast(m))
    def spansOf(layout: String, bucket: Column): DataFrame =
      spanFracs(layout, base.withColumn("bucket", bucket))
    val x8 = scaledTo(col("user_id"), col("minu"), col("maxu"), 256)
    val y8 = scaledTo(col("sec"), col("mins"), col("maxs"), 256)
    val zBucket = floor(interleave(x8, y8, 8).cast("double") / 1024).cast("long")
    spansOf("zorder", zBucket)
      .unionAll(spansOf("time_sort", scaledTo(col("sec"), col("mins"), col("maxs"), 64)))
      .unionAll(spansOf("user_sort", scaledTo(col("user_id"), col("minu"), col("maxu"), 64)))
      .orderBy(col("layout"))
  }

  /** Scale a dimension to 0..buckets−1 over its observed extent —
    * shared by both comparison queries (and their oracles' mirrored
    * arithmetic), so the extent scaling cannot drift between them.
    */
  private def scaledTo(v: Column, lo: Column, hi: Column, buckets: Int): Column =
    floor((v - lo).cast("double") * buckets / (hi - lo + 1).cast("double"))
      .cast("long")

  /** The event-weighted per-dimension span-fraction aggregate over a
    * bucketed base frame (must carry user_id, sec, the minu/maxu/
    * mins/maxs extent columns and `bucket`) — ONE definition for
    * [[layoutCompareDf]] and [[hilbertCompareDf]] so the exact-int64
    * weighted sums and the snapped divisions stay identical across
    * their hash-gated oracles.
    */
  private def spanFracs(layout: String, bucketed: DataFrame): DataFrame =
    bucketed
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (max(col("user_id")) - min(col("user_id"))).as("usp"),
        (max(col("sec")) - min(col("sec"))).as("tsp"),
        first(col("maxu") - col("minu")).as("ur"),
        first(col("maxs") - col("mins")).as("tr"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n") * col("usp")).as("wu"), sum(col("n") * col("tsp")).as("wt"),
        sum(col("n")).as("tn"), first(col("ur")).as("ur"), first(col("tr")).as("tr"))
      .select(lit(layout).as("layout"), col("n_buckets"),
        when(col("ur") > 0, floor(col("wu").cast("double") / col("tn").cast("double")
          / col("ur").cast("double") * 1e6 + 0.5) / 1e6).otherwise(lit(0.0))
          .as("user_span_frac"),
        when(col("tr") > 0, floor(col("wt").cast("double") / col("tn").cast("double")
          / col("tr").cast("double") * 1e6 + 0.5) / 1e6).otherwise(lit(0.0))
          .as("ts_span_frac"))

  /** HILBERT xy→d (order `bits`; the public-domain quadrant-rotation
    * algorithm) appended as column `out`. The input columns `x`/`y`
    * are LEFT IN PLACE (the recurrence runs over internal copies,
    * which are dropped). One chained projection PER LEVEL:
    * each level's (d, x, y) reference the previous level's RESOLVED
    * columns several times, which blocks CollapseProject from
    * re-inlining the recurrence into one exponential expression tree
    * (the interleave helper is a flat sum, but the Hilbert rotation is
    * a genuine recurrence — inlined naively it grows 4^bits nodes).
    * The quadrant id (3·rx) XOR ry is written as the equivalent CASE
    * so the oracle replays it without bitwise-xor portability traps.
    */
  def withHilbert(df: DataFrame, x: String, y: String, bits: Int,
                  out: String): DataFrame = {
    val n = 1L << bits
    var cur = df.withColumn("hx", col(x)).withColumn("hy", col(y))
      .withColumn(out, lit(0L))
    for (k <- (bits - 1) to 0 by -1) {
      val s = 1L << k
      val rx = shiftright(col("hx"), k).bitwiseAND(lit(1L))
      val ry = shiftright(col("hy"), k).bitwiseAND(lit(1L))
      val quad = when(rx === 0 && ry === 0, lit(0L))
        .when(rx === 0, lit(1L))
        .when(ry === 1, lit(2L))
        .otherwise(lit(3L))
      // rot: ry == 0 reflects (when rx == 1, within the FULL n side)
      // and swaps the axes; ry == 1 leaves the frame unchanged
      val nx = when(ry === 0,
        when(rx === 1, lit(n - 1) - col("hy")).otherwise(col("hy")))
        .otherwise(col("hx"))
      val ny = when(ry === 0,
        when(rx === 1, lit(n - 1) - col("hx")).otherwise(col("hx")))
        .otherwise(col("hy"))
      cur = cur
        .withColumn("h_d2", col(out) + lit(s * s) * quad)
        .withColumn("hx2", nx)
        .withColumn("hy2", ny)
        .drop(out, "hx", "hy")
        .withColumnRenamed("h_d2", out)
        .withColumnRenamed("hx2", "hx")
        .withColumnRenamed("hy2", "hy")
    }
    cur.drop("hx", "hy")
  }

  /** HILBERT vs MORTON — the space-filling-curve bake-off as one
    * hash-gated table (the q_layout_compare methodology, curve
    * question isolated): the same events bucketed 32 ways under the
    * Morton interleave and the Hilbert index, each reporting its
    * event-weighted mean span FRACTION per dimension. The bucket
    * count is deliberately NOT a power of 4: at 4^k-aligned
    * boundaries both curves tile the identical k-level quadrants
    * (measured equal at 64 buckets), while at the 2·4^k boundary each
    * bucket spans TWO quadrants — Hilbert's no-jump property keeps
    * those adjacent (balanced ~0.187/0.187 spans at sf0.1) where
    * Morton's quadrant pairing is axis-lopsided (0.249/0.125): the
    * WORST dimension, which is what bounds a dual-predicate scan, is
    * ~25% tighter under Hilbert — the effect behind liquid
    * clustering's move off Z-order. Same FP discipline: exact int64
    * weighted sums in seconds, one snapped division per fraction.
    */
  def hilbertCompare(spark: SparkSession, d: String): DataFrame =
    hilbertCompareDf(Tables.events(spark, d))

  def hilbertCompareDf(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), unix_seconds(col("ts")).as("sec"))
    val m = e.agg(
      min(col("user_id")).as("minu"), max(col("user_id")).as("maxu"),
      min(col("sec")).as("mins"), max(col("sec")).as("maxs"))
    val base = e.crossJoin(broadcast(m))
      .withColumn("x", scaledTo(col("user_id"), col("minu"), col("maxu"), 256))
      .withColumn("y", scaledTo(col("sec"), col("mins"), col("maxs"), 256))
    val hilbert = spanFracs("hilbert",
      withHilbert(base, "x", "y", 8, "h")
        .withColumn("bucket", floor(col("h").cast("double") / 2048).cast("long")))
    val morton = spanFracs("morton",
      base.withColumn("bucket",
        floor(interleave(col("x"), col("y"), 8).cast("double") / 2048).cast("long")))
    hilbert.unionAll(morton).orderBy(col("layout"))
  }
}

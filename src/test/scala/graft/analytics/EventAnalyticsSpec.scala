package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention semantics on planted event
  * streams — the ORDERING contracts the oracles exercise only
  * statistically at corpus scale.
  */
class EventAnalyticsSpec extends SparkTestBase {

  test("funnel counts only in-order progressions") {
    val r = ExtraQueries.eventFunnel(spark, sfDir).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getString(1)).toSeq == ExtraQueries.FunnelSteps)
    // the funnel is monotone by construction: each step's users are a
    // subset of the previous step's
    val ns = r.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"funnel must be monotone: ${ns.toSeq}")
    assert(ns.head > 0, "fixture corpus must enter the funnel")
    // rates are consistent with the counts (6-dp exact-ratio snap)
    r.foreach { row =>
      val fromTop = math.floor(row.getLong(2).toDouble / ns.head * 1e6 + 0.5) / 1e6
      assert(row.getDouble(3) == fromTop)
    }
  }

  test("funnel ordering: a purchase BEFORE the click does not convert") {
    import spark.implicits._
    // user 1 progresses in order; user 2 purchased before clicking —
    // its purchase must not count; user 3 never clicked
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 1L, "click"),
      (3L, "2024-01-01 12:00:00", 1L, "purchase"),
      (4L, "2024-01-02 10:00:00", 2L, "view"),
      (5L, "2024-01-02 10:30:00", 2L, "purchase"),
      (6L, "2024-01-02 11:00:00", 2L, "click"),
      (7L, "2024-01-03 10:00:00", 3L, "view")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    // drive the step fold directly through a temp sfDir-free path: the
    // funnel core reads Tables.events(spark, d), so plant via a temp view
    // of the same shape written to parquet
    val dir = java.nio.file.Files.createTempDirectory("funnel_fx").toString
    ev.withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ExtraQueries.eventFunnel(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got("view") == 3L)
    assert(got("click") == 2L, "users 1 and 2 clicked after viewing")
    assert(got("purchase") == 1L,
      "only user 1 purchased AFTER clicking — user 2's early purchase must not count")
  }

  test("funnel latency: zero conversions still yields exactly one NULL-stats row") {
    import spark.implicits._
    // nobody completes the funnel (views only) — the DuckDB oracle's
    // scalar-subquery shape always emits 1 row with NULL stats, so the
    // Spark side must too (left join, not crossJoin, on the median)
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-02 10:00:00", 2L, "view")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val dir = java.nio.file.Files.createTempDirectory("funnel_empty_fx").toString
    ev.withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = ExtraQueries.funnelLatency(spark, dir).collect()
    assert(rows.length == 1, "empty-conversion funnel must emit exactly one row")
    val r = rows.head
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
      "all latency stats must be NULL when nobody converts")
  }

  test("event sequences: contiguity is strict; support counts users once") {
    import spark.implicits._
    // user 1 does view>click>purchase twice (4 occurrences of 2-step
    // pairs, but user-support must count user 1 ONCE per pattern);
    // user 2 does view ... purchase with a click of a DIFFERENT page
    // between — view>purchase is NOT contiguous for anyone
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:01:00", 1L, "click"),
      (3L, "2024-01-01 10:02:00", 1L, "view"),
      (4L, "2024-01-01 10:03:00", 1L, "click"),
      (5L, "2024-01-02 10:00:00", 2L, "view"),
      (6L, "2024-01-02 10:01:00", 2L, "scroll"),
      (7L, "2024-01-02 10:02:00", 2L, "purchase")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val dir = java.nio.file.Files.createTempDirectory("seq_fx").toString
    ev.withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ExtraQueries.frequentEventSequences(spark, dir, minSupport = 0.0)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got("view>click") == (2L, 1L),
      s"two occurrences, ONE supporting user: $got")
    assert(!got.contains("view>purchase"),
      s"non-contiguous pattern must not appear: $got")
    assert(got("view>scroll>purchase") == (1L, 1L), s"3-step: $got")
    assert(got("view>click>view") == (1L, 1L), s"cross-repeat 3-step: $got")
    // support = users/total at 6dp: user 1 of 2 total
    val sup = ExtraQueries.frequentEventSequences(spark, dir, minSupport = 0.0)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(sup("view>click") == 0.5, s"support snap: $sup")
  }

  test("data-quality audit: planted violations are counted per rule") {
    val rows = Expectations.dataQualityAudit(spark, sfDir).collect()
    assert(rows.length == 10, s"one row per rule: ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"rule ${r.getString(0)} checked nothing")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      val expect = math.floor((r.getLong(1) - r.getLong(2)).toDouble /
        r.getLong(1) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) == expect, s"pass_rate mismatch on ${r.getString(0)}")
    }
    // the synthetic tables are referentially intact — both FK rules pass clean
    val byRule = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byRule("lineitem.orderkey_refs_orders") == 0L)
    assert(byRule("orders.custkey_refs_customer") == 0L)
  }

  test("rfm: quintiles balanced, scores track the metrics, segment composes them") {
    val rows = ExtraQueries.rfmSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (i <- Seq(4, 5, 6)) {
      val byScore = rows.groupBy(_.getLong(i))
      assert(byScore.keySet.subsetOf((1L to 5L).toSet))
      // NTILE balance: bucket sizes differ by at most one
      val sizes = byScore.values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"unbalanced quintiles at col $i: $byScore")
    }
    rows.foreach { r =>
      assert(r.getString(7) ==
        s"${r.getLong(4)}${r.getLong(5)}${r.getLong(6)}")
    }
    // monotone: every f_score=5 user purchases at least as often as
    // every f_score=1 user
    val f5 = rows.filter(_.getLong(5) == 5L).map(_.getLong(2))
    val f1 = rows.filter(_.getLong(5) == 1L).map(_.getLong(2))
    assert(f5.min >= f1.max, "frequency quintiles out of order")
  }

  test("activity anomalies: a planted burst day is flagged, stable users are not") {
    import spark.implicits._
    // user 1: 9 days at 2 events + one 30-event burst; user 2: flat
    val ev = (1 to 9).flatMap(dy => Seq.tabulate(2)(i =>
        (dy * 100L + i, f"2024-01-$dy%02d 10:0$i:00", 1L, "view"))) ++
      Seq.tabulate(30)(i => (9000L + i, f"2024-01-10 11:${i % 60}%02d:00", 1L, "view")) ++
      (1 to 10).flatMap(dy => Seq.tabulate(3)(i =>
        (20000L + dy * 10 + i, f"2024-01-$dy%02d 09:0$i:00", 2L, "view")))
    val dir = java.nio.file.Files.createTempDirectory("anom_fx").toString
    ev.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ExtraQueries.activityAnomalies(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, "2024-01-10", 30L, 2L, 0L)),
      s"exactly the burst day flags (med 2, MAD 0 -> threshold 3): $got")
  }

  test("copurchase rules: hand-checked support/confidence/lift on a planted basket set") {
    import spark.implicits._
    // baskets: {A,B} x2, {A,C}, {B,C}, {A,B,C} -> AB sup 3, AC/BC sup 2
    val li = Seq(
      (1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L), (3L, 100L), (3L, 300L),
      (4L, 200L), (4L, 300L), (5L, 100L), (5L, 200L), (5L, 300L)
    ).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("basket_fx").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = ExtraQueries.copurchaseRules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // lift(AB) = 5*3/(4*4) = 0.9375; lift(AC) = lift(BC) = 5*2/12,
    // tie broken by keys
    assert(rows.toSeq == Seq(
      (100L, 200L, 3L, 4L, 4L, 0.75, 0.9375),
      (100L, 300L, 2L, 4L, 3L, 0.5, 0.833333),
      (200L, 300L, 2L, 4L, 3L, 0.5, 0.833333)), s"got ${rows.toSeq}")
  }

  test("cohort retention: offsets are non-negative, week 0 is full, counts bounded") {
    val rows = ExtraQueries.cohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, act, coh, ret) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(off >= 0, "activity cannot precede the cohort week")
      assert(act <= coh, "active users are a subset of the cohort")
      assert(ret == math.floor(act.toDouble / coh * 1e6 + 0.5) / 1e6)
    }
    // every user is active in their own first week: offset 0 has
    // retention 1 for every cohort
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"week-0 must be full: $r")
    }
  }

  test("attribution: first/last touch picks, lookback bound, none bucket") {
    import spark.implicits._
    // user 1: view -> click -> purchase (both in window): first=view,
    //   last=click
    // user 2: purchase with no touches at all: none
    // user 3: a view 25h BEFORE the purchase (outside the 24h
    //   lookback): none — the regression case for the join-condition
    //   placement (a post-join filter would drop this conversion)
    // user 4: a click AFTER the purchase only: none
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 1L, "click"),
      (3L, "2024-01-01 12:00:00", 1L, "purchase"),
      (4L, "2024-01-02 12:00:00", 2L, "purchase"),
      (5L, "2024-01-03 10:00:00", 3L, "view"),
      (6L, "2024-01-04 11:00:00", 3L, "purchase"),
      (7L, "2024-01-05 12:00:00", 4L, "click"),
      (8L, "2024-01-05 11:00:00", 4L, "purchase")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val got = ExtraQueries.conversionAttributionDf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val q = math.floor(1.0 / 4 * 1e6 + 0.5) / 1e6
    val h = math.floor(3.0 / 4 * 1e6 + 0.5) / 1e6
    assert(got == Map(
      ("first", "view") -> ((1L, q)), ("first", "none") -> ((3L, h)),
      ("last", "click") -> ((1L, q)), ("last", "none") -> ((3L, h))),
      s"attribution table off: $got")
  }
}

package graft.storage

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.analytics.Skew
import graft.streaming.StatefulStreams

/** The 100 TB toolbox: bucketed co-located joins (no shuffle), salted
  * skew handling (identical results), and custom streaming state.
  */
class ScaleToolsSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without any Exchange in the plan") {
    // idempotent across JVMs: drop catalog entries AND stale locations
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val orders = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(li, "lineitem_b", "o_orderkey", buckets = 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it computes the same thing as the plain join
      val expected = Tables.orders(spark, sfDir).join(
        Tables.lineitem(spark, sfDir),
        $"o_orderkey" === $"l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("salted sum equals direct aggregation (skewed key distribution)") {
    val skewed = (1 to 5000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i.toLong))
      .toDF("k", "v")
    val direct = skewed.groupBy($"k").agg(sum($"v").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(skewed, $"k", $"v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(direct("HOT") == (1 to 5000).filter(_ % 10 != 0).map(_.toLong).sum)
  }

  test("salted sum spreads a hot key with LOW-cardinality values across salts") {
    // the skew workload salting exists for: hot key, near-constant value
    val skewed = (1 to 4000).map(i => ("HOT", 1L, s"row$i")).toDF("k", "v", "payload")
    val partials = skewed.withColumn("_salt",
        pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(8)))
      .groupBy($"k", $"_salt").count().count()
    assert(partials >= 6, s"hot key collapsed to $partials salt groups of 8")
    val total = Skew.saltedSum(skewed, $"k", $"v", salts = 8)
      .collect().head.getLong(1)
    assert(total == 4000L)
  }

  test("salted join is row-identical to the plain join") {
    val big = (1 to 2000).map(i => (if (i % 3 == 0) "k1" else "k" + i, i.toLong))
      .toDF("key", "payload")
    val small = Seq(("k1", "dim1"), ("k5", "dim5"), ("k100", "dim100"))
      .toDF("key", "attr")
    val plain = big.join(small, "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "key", salts = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("date-partitioned store prunes partitions at listing time") {
    val path = java.nio.file.Files.createTempDirectory("events_part").toString + "/events"
    PartitionedStore.writeEventsByDay(Tables.events(spark, sfDir), path)
    val day = Tables.events(spark, sfDir)
      .agg(min(to_date($"ts")).cast("string")).collect().head.getString(0)
    val df = PartitionedStore.readDay(spark, path, day)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_date"), s"no partition pruning in:\n$scan")
    // pruned read returns exactly that day's rows
    val expected = Tables.events(spark, sfDir).filter(to_date($"ts") === lit(day)).count()
    assert(df.count() == expected && expected > 0)
  }

  test("streaming dedup within watermark drops re-delivered content") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val docs = input.toDF().toDF("domain", "content", "kafka_timestamp")
    val query = graft.streaming.StreamingStats.streamingDedup(docs)
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      input.addData(
        ("a", "same text", Timestamp.valueOf("2024-01-01 00:00:01")),
        ("a", "same text", Timestamp.valueOf("2024-01-01 00:00:02")),
        ("b", "other", Timestamp.valueOf("2024-01-01 00:00:03")))
      query.processAllAvailable()
      input.addData(("a", "same text", Timestamp.valueOf("2024-01-01 00:00:04")))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("dedup_test").collect()
    assert(rows.map(_.getString(1)).sorted.toSeq == Seq("other", "same text"),
      "re-delivered content must be dropped across batches within the watermark")
  }

  test("stream-stream join with event-time bounds enriches within the window") {
    implicit val sqlCtx = spark.sqlContext
    val docsIn = MemoryStream[(String, String, Timestamp)]
    val ctlIn = MemoryStream[(String, String, Timestamp)]
    val docs = docsIn.toDF().toDF("domain", "content", "kafka_timestamp")
    val controls = ctlIn.toDF().toDF("control_domain", "control_kind", "control_ts")
    val joined = graft.streaming.StreamingStats.joinWithControlStream(docs, controls)
    val query = joined.writeStream.format("memory")
      .queryName("ssj_test").outputMode("append").start()
    try {
      ctlIn.addData(
        ("a", "allow", Timestamp.valueOf("2024-01-01 00:00:00")),
        ("b", "allow", Timestamp.valueOf("2024-01-01 00:10:00")))
      docsIn.addData(
        ("a", "doc in window", Timestamp.valueOf("2024-01-01 00:00:20")),
        ("a", "doc out of window", Timestamp.valueOf("2024-01-01 00:05:00")),
        ("b", "doc before control", Timestamp.valueOf("2024-01-01 00:05:00")))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("ssj_test").collect().map(_.getAs[String]("content"))
    assert(rows.toSeq == Seq("doc in window"),
      s"only the doc within 30s after its domain's control joins, got ${rows.toSeq}")
  }

  test("flatMapGroupsWithState: running domain totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("domain", "content")
    val updates = StatefulStreams.runningDomainTotals(docs)
    val query = updates.writeStream.format("memory")
      .queryName("state_test").outputMode("append").start()
    try {
      input.addData(("a", "xxxx"), ("a", "yy"), ("b", "zzz"))
      query.processAllAvailable()
      input.addData(("a", "w"))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("state_test")
      .orderBy($"cumDocs", $"domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.contains(("a", 2L, 2L, 6L)), s"batch-1 a update missing in $rows")
    assert(rows.contains(("b", 1L, 1L, 3L)))
    assert(rows.contains(("a", 1L, 3L, 7L)), "state must carry across batches")
  }

  test("streaming funnel: stateful step machine equals the batch MIN-chain semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val events = input.toDF().toDF("user_id", "event_type", "ts_s", "event_id")
      .selectExpr("user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id")
    val updates = StatefulStreams.streamingFunnel(events)
    val query = updates.writeStream.format("memory")
      .queryName("funnel_state_test").outputMode("append").start()
    try {
      // batch 1, deliberately DISORDERED within the batch: the fold
      // must sort by (ts, event_id) before advancing. user 2's
      // purchase precedes its click in event time — it must not count.
      input.addData(
        (1L, "click", "2024-01-01 11:00:00", 2L),
        (1L, "view", "2024-01-01 10:00:00", 1L),
        (2L, "view", "2024-01-02 10:00:00", 4L),
        (2L, "purchase", "2024-01-02 10:30:00", 5L),
        (2L, "click", "2024-01-02 11:00:00", 6L),
        (3L, "view", "2024-01-03 10:00:00", 7L))
      query.processAllAvailable()
      // batch 2: user 1 converts across the batch boundary (state carry)
      input.addData((1L, "purchase", "2024-01-01 12:00:00", 3L))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("funnel_state_test").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val want = Set(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "view"), (2L, 2, "click"),
      (3L, 1, "view"))
    assert(rows == want,
      s"streamed advances $rows != batch MIN-chain semantics $want")
  }

  test("streaming attribution: stateful credits equal the batch picks per conversion") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val events = input.toDF().toDF("user_id", "event_type", "ts_s", "event_id")
      .selectExpr("user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts",
        "event_id")
    val credits = StatefulStreams.streamingAttribution(events)
    val query = credits.writeStream.format("memory")
      .queryName("attr_state_test").outputMode("append").start()
    val batch1 = Seq(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-01 11:00:00", 2L),
      (1L, "purchase", "2024-01-01 12:00:00", 3L),
      (3L, "view", "2024-01-03 10:00:00", 5L),
      (2L, "purchase", "2024-01-02 12:00:00", 4L)) // no touches: none
    val batch2 = Seq(
      // user 3's only view is 25 h old — out of window across batches
      (3L, "purchase", "2024-01-04 11:00:00", 6L),
      // user 1 converts AGAIN: first = the batch-1 view (state carry),
      // last = the fresh signup
      (1L, "signup", "2024-01-01 12:30:00", 7L),
      (1L, "purchase", "2024-01-01 13:00:00", 8L),
      // user 4: the touch shares the conversion's TIMESTAMP (with a
      // larger event_id) — the batch join's tts <= cts credits it, so
      // the stream's tie order must fold the touch first
      (4L, "purchase", "2024-01-05 09:00:00", 9L),
      (4L, "view", "2024-01-05 09:00:00", 10L))
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("attr_state_test").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    val all = (batch1 ++ batch2)
      .toDF("user_id", "event_type", "ts_s", "event_id")
      .selectExpr("user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts",
        "event_id")
    val want = graft.analytics.ExtraQueries.attributionPicksDf(all).collect()
      .map(r => (r.getLong(1), r.getString(0), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == want, s"streamed credits $got != batch picks $want")
    // the fixture exercises the interesting paths
    assert(want.contains((6L, "first", "none", -1L)),
      "out-of-window carry must credit none")
    assert(want.contains((8L, "first", "view", 1L)) &&
      want.contains((8L, "last", "signup", 7L)),
      "cross-batch state must feed the second conversion's picks")
    assert(want.contains((9L, "first", "view", 10L)),
      "an equal-timestamp touch must be credited (tts <= cts)")
  }

  test("z-order: interleave round-trips known Morton codes; buckets bound BOTH dimensions") {
    // hand-checked Morton codes: x even bits, y odd bits
    val codes = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (3L, 0L, 5L), (0L, 3L, 10L), (255L, 255L, 65535L))
      .toDF("x", "y", "expected")
      .withColumn("z", ZOrder.interleave($"x", $"y", 8))
      .collect()
    codes.foreach(r => assert(r.getLong(3) == r.getLong(2),
      s"interleave(${r.getLong(0)}, ${r.getLong(1)}) = ${r.getLong(3)}, want ${r.getLong(2)}"))
    // locality on the real table: a z-bucket's extent must be bounded
    // in BOTH dimensions — a time sort would leave user_span at the
    // full range in every bucket
    val ev = graft.Tables.events(spark, sfDir)
    val full = ev.agg(
      (max($"user_id") - min($"user_id")).cast("double"),
      (max(unix_micros($"ts")) - min(unix_micros($"ts"))).cast("double"))
      .collect().head
    val (userRange, tsRange) = (full.getDouble(0), full.getDouble(1))
    val buckets = ZOrder.zorderEventsDf(ev).collect()
      .map(r => (r.getLong(1), r.getLong(3).toDouble, r.getLong(4).toDouble))
    // event-weighted mean span per dimension
    val n = buckets.map(_._1).sum.toDouble
    val meanUserSpan = buckets.map(b => b._1 * b._2).sum / n
    val meanTsSpan = buckets.map(b => b._1 * b._3).sum / n
    assert(meanUserSpan < 0.5 * userRange,
      s"z-buckets must bound the user dimension: $meanUserSpan vs full $userRange")
    assert(meanTsSpan < 0.5 * tsRange,
      s"z-buckets must bound the time dimension: $meanTsSpan vs full $tsRange")
  }

  test("layout compare: each sort is blind on its off dimension; z-order bounds both") {
    val rows = ZOrder.layoutCompare(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val (zu, zt) = rows("zorder")
    val (tu, tt) = rows("time_sort")
    val (uu, ut) = rows("user_sort")
    // a sort serves its own dimension and is blind on the other
    assert(tt < 0.1 && tu > 0.8, s"time sort: $tt/$tu")
    assert(uu < 0.1 && ut > 0.8, s"user sort: $uu/$ut")
    // z-order pays a bounded fraction on BOTH — the theory says ~1/8
    // for 3 interleaved bits per dimension at 64 buckets
    assert(zu < 0.3 && zt < 0.3, s"zorder must bound both: $zu/$zt")
    assert(zu < tu && zt < ut,
      "z-order must beat each sort on its blind dimension")
  }

  test("hilbert: bijective over the grid, consecutive d grid-adjacent, bounds both dims") {
    // order-2 grid (16 cells): the index must be a bijection onto
    // 0..15 and the traversal must have the NO-JUMP property —
    // consecutive d values sit in grid-adjacent cells (|dx|+|dy| = 1),
    // the defining Hilbert property Morton lacks (Morton jumps at
    // every quadrant boundary)
    val grid = (for { x <- 0L until 4L; y <- 0L until 4L } yield (x, y))
      .toDF("x", "y")
    val d = ZOrder.withHilbert(grid, "x", "y", 2, "h").collect()
      .map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    assert(d.keySet == (0L until 16L).toSet, s"not a bijection: ${d.keySet}")
    (0L until 15L).foreach { i =>
      val (x1, y1) = d(i)
      val (x2, y2) = d(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$i ($x1,$y1) and d=${i + 1} ($x2,$y2)")
    }
    // the registered bake-off at 32 buckets (2·4^k — each bucket spans
    // TWO quadrants, where the curves actually differ): Hilbert's
    // buckets stay connected and BALANCED across dimensions; Morton's
    // quadrant pairing is axis-lopsided, so its WORST dimension — the
    // one that bounds a dual-predicate scan — is strictly looser
    val rows = ZOrder.hilbertCompare(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val (hu, ht) = rows("hilbert")
    val (mu, mt) = rows("morton")
    assert(hu < 0.3 && ht < 0.3, s"hilbert must bound both: $hu/$ht")
    assert(math.max(hu, ht) < math.max(mu, mt),
      s"hilbert's worst dimension must beat morton's: h=$hu/$ht m=$mu/$mt")
    assert(math.abs(hu - ht) < math.abs(mu - mt),
      s"hilbert must be the more balanced curve: h=$hu/$ht m=$mu/$mt")
  }
}

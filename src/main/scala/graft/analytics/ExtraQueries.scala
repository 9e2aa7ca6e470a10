package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.extract.{HtmlToMarkdown, TextExtract}

/** Operators closing out the SURVEY §2 inventory: the ad-hoc SQL entry
  * point (S3), log-line regex parsing (T9), offset/limit slicing (O5),
  * html→markdown over a column (T10), and the Vietnamese-date pipeline
  * (parse_vn_date + dash-run stripping) — each as an oracle-checkable
  * query.
  */
object ExtraQueries {

  /** User-behavior Markov model: event-type transition counts and
    * probabilities over each user's time-ordered event stream — the
    * bigram LM idea applied to the events table (session-modeling /
    * next-action-prediction features; transition probability snapped
    * at 6 dp via the exact-integer-ratio pattern). One lag window per
    * user + one (prev, next) aggregate; the probability denominator
    * rides a prev-keyed window over the ALREADY-aggregated transition
    * table (|event types|² rows), so nothing corpus-sized shuffles
    * twice.
    */
  def eventTransitions(spark: SparkSession, d: String): DataFrame = {
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
    transitionCounts(spark, d)
      .withColumnRenamed("n", "n_transitions")
      .withColumn("p_transition",
        floor(col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(wp) * lit(1e6) + lit(0.5)) / lit(1e6))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** The (prev_type, next_type, n) transition-count table — the shared
    * core of [[eventTransitions]] and [[transitionEntropy]] (one
    * definition, no drift; mirrored by the shared t/g oracle CTEs).
    */
  private def transitionCounts(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Conditional next-action entropy of the [[eventTransitions]] model,
    * per source state: H(next | prev) in micro-nats — how predictable a
    * user's next event is given the current one (the behavior-model
    * quality audit). Per-branch terms −p·ln(p) are micro-nat snapped
    * BEFORE the sum (the q_dsir_weights discipline), so the per-state
    * entropy is an exact BIGINT on both engines.
    */
  def transitionEntropy(spark: SparkSession, d: String): DataFrame = {
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
    transitionCounts(spark, d)
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(wp))
      .withColumn("term",
        floor(-(col("p") * log(col("p"))) * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("prev_type"))
      .agg(sum(col("n")).as("n_from"),
        count(lit(1)).as("n_branches"),
        sum(col("term")).as("entropy_micronat"))
      .orderBy(col("prev_type"))
  }

  /** Frequent contiguous event sequences (the GSP flavor restricted to
    * contiguous occurrences): length-2 and length-3 event-type patterns
    * over each user's time-ordered stream, with occurrence counts,
    * distinct-user counts, and user support (exact micro-snapped
    * ratio). The sequence-MINING complement of [[eventTransitions]]:
    * the transition model scores P(next | prev) for a known step, this
    * surfaces WHICH multi-step behaviors are common — the
    * funnel-discovery primitive (q_event_funnel then audits a chosen
    * chain).
    *
    * Scale shape: ONE per-user window pass (two leads over the shared
    * (ts, event_id) order), then aggregates on pattern keys bounded by
    * \|event types\|³ — tiny however large the stream; the user total
    * rides a 1-row broadcast. Patterns below `minSupport` are pruned.
    */
  def frequentEventSequences(spark: SparkSession, d: String,
                             minSupport: Double = SeqMinSupport): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val s = Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("a"))
      .withColumn("b", lead(col("a"), 1).over(w))
      .withColumn("c", lead(col("a"), 2).over(w))
    val p2 = s.filter(col("b").isNotNull)
      .select(col("user_id"), lit(2).as("k"),
        concat_ws(">", col("a"), col("b")).as("pattern"))
    val p3 = s.filter(col("c").isNotNull)
      .select(col("user_id"), lit(3).as("k"),
        concat_ws(">", col("a"), col("b"), col("c")).as("pattern"))
    val totalUsers = Tables.events(spark, d)
      .agg(countDistinct(col("user_id")).as("nu"))
    p2.union(p3)
      .groupBy(col("k"), col("pattern"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user_id")).as("n_users"))
      .crossJoin(broadcast(totalUsers))
      .withColumn("support",
        floor(col("n_users").cast("double") / col("nu") * lit(1e6) + lit(0.5)) / lit(1e6))
      .filter(col("support") >= minSupport)
      .select(col("k"), col("pattern"), col("n_occurrences"),
        col("n_users"), col("support"))
      .orderBy(col("k"), col("n_users").desc, col("pattern"))
  }

  /** S3: the reference's declared ad-hoc SQL surface
    * (`spark/visualize.py:27` — which never worked there, §2.12): register
    * the corpus as a temp view and run SQL text against it.
    */
  def sqlOverView(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d).createOrReplaceTempView("documents_view")
    spark.sql(
      """SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(length(text)) AS BIGINT) AS total_chars
        |FROM documents_view
        |GROUP BY source
        |ORDER BY n_docs DESC, source""".stripMargin)
  }

  /** T9: regex parse over a lines DataFrame (reference
    * `spark/export_stats.py:21-62` re-parsed its own console logs; the
    * operator itself is regexp_extract per field). Lines are synthesized
    * deterministically from `events` so the parse is oracle-checkable,
    * then parsed back and aggregated.
    */
  def logLineParse(spark: SparkSession, d: String): DataFrame = {
    val lines = Tables.events(spark, d).select(
      format_string("[batch %d] domain=%s count=%d",
        col("event_id") % 50, col("event_type"), col("user_id") % 10 + 1
      ).as("line"))
    lines.select(
        regexp_extract(col("line"), "\\[batch (\\d+)\\]", 1).cast("long").as("batch_id"),
        regexp_extract(col("line"), "domain=(\\w+)", 1).as("domain"),
        regexp_extract(col("line"), "count=(\\d+)", 1).cast("long").as("cnt"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cnt")).as("total_count"),
        countDistinct(col("batch_id")).as("n_batches"))
      .orderBy(col("domain"))
  }

  /** O5: offset/limit range slice (reference `crawl/crawl.py:120-124`
    * batch windowing) — deterministic order, then `data[start:end]`.
    */
  def offsetSlice(spark: SparkSession, d: String,
                  start: Int = 1000, count: Int = 50): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .offset(start)
      .limit(count)

  /** T10 as a query: synthesize a small HTML document per row (the corpus
    * text is HTML-safe: no &/</> in the generated data) and convert it.
    */
  def htmlToMarkdownDocs(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        concat(lit("<h2>DOC "), col("doc_id").cast("string"), lit("</h2><p>"),
          col("text"), lit("</p>")).as("html"))
      .select(col("doc_id"), HtmlToMarkdown.htmlToMarkdownCol(col("html")).as("md"))
      .orderBy(col("doc_id"))

  /** The custom as-of join PHYSICAL operator
    * ([[graft.plans.AsOfJoin]]: logical node → strategy → sort-merge
    * exec) on the same task as the composed q_asof_join — sharing that
    * query's DuckDB oracle, so the custom operator gets a full
    * hash-compared correctness row, not just a plan test.
    */
  def asofJoinCustom(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    graft.plans.AsOfJoin.asof(purchases, errors, "user_id", "e_user", "ts", "e_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("e_ts").as("prev_error_ts"))
      .orderBy(col("event_id"))
  }

  /** Correlated scalar subqueries through the SQL surface — exercises
    * Catalyst's subquery decorrelation (rewritten to joins + aggregates;
    * SURVEY §4 listed it as un-exercised). The predicate is kept in
    * exact decimal arithmetic (o_totalprice·n > 1.5·Σ, i.e. "order is
    * 1.5× its customer's average") so both engines compare identically —
    * a double AVG would make near-threshold rows engine-dependent.
    */
  def aboveAvgOrders(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders_sub")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_sub o
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
        |      (SELECT COUNT(*) FROM orders_sub o2 WHERE o2.o_custkey = o.o_custkey)
        |    > 1.5 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |             FROM orders_sub o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q2-style correlated-MIN subquery (adapted: this schema has no
    * partsupp, so per-part minimum l_extendedprice over lineitem stands
    * in for minimum supplycost). Exercises Catalyst's scalar-subquery
    * decorrelation: the correlated `(SELECT min(...) WHERE same part)`
    * rewrites to a per-part aggregate + join — one extra pass over
    * lineitem, NOT a per-row re-scan, which is what makes the shape
    * viable at 100 TB. The p_size filter keeps the part side small
    * enough that the planner broadcasts it.
    */
  def minPricePerPart(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_q2")
    Tables.part(spark, d).createOrReplaceTempView("part_q2")
    Tables.supplier(spark, d).createOrReplaceTempView("supplier_q2")
    Tables.nation(spark, d).createOrReplaceTempView("nation_q2")
    spark.sql(
      """SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
        |       l.l_extendedprice AS min_price
        |FROM lineitem_q2 l
        |JOIN part_q2 p ON l.l_partkey = p.p_partkey
        |JOIN supplier_q2 s ON l.l_suppkey = s.s_suppkey
        |JOIN nation_q2 n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_size <= 5
        |  AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
        |                           FROM lineitem_q2 l2
        |                           WHERE l2.l_partkey = l.l_partkey)
        |ORDER BY p.p_partkey, s.s_name""".stripMargin)
  }

  /** TPC-H Q18-style group-HAVING semi-join: orders whose total lineitem
    * quantity exceeds a threshold, with customer context. The IN
    * subquery with HAVING plans as an aggregate + LeftSemi join — the
    * qualifying-key set flows into the join, never the full lineitem.
    * Quantities are integral-valued, so the double sum is exact and
    * engine-portable; cast to BIGINT for a stable oracle column type.
    */
  def largeQuantityOrders(spark: SparkSession, d: String,
                          threshold: Int = 250): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders_q18")
    Tables.customer(spark, d).createOrReplaceTempView("customer_q18")
    Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_q18")
    spark.sql(
      s"""SELECT c.c_name, o.o_orderkey, o.o_totalprice,
         |       CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
         |FROM orders_q18 o
         |JOIN customer_q18 c ON o.o_custkey = c.c_custkey
         |JOIN lineitem_q18 l ON o.o_orderkey = l.l_orderkey
         |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem_q18
         |                       GROUP BY l_orderkey
         |                       HAVING SUM(l_quantity) > $threshold)
         |GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
         |ORDER BY o.o_totalprice DESC, o.o_orderkey
         |LIMIT 100""".stripMargin)
  }

  /** TPC-H Q4-style correlated EXISTS (adapted: "shipped late" =
    * l_shipdate more than 60 days after o_orderdate, since this schema
    * has no commit/receipt dates). Completes the subquery-shape family
    * (scalar-correlated, IN+HAVING, EXISTS): Catalyst plans the EXISTS
    * as a LeftSemi join on the equi-key with the date comparison as a
    * join condition — lineitem is never re-scanned per order row.
    */
  def latePriorityCounts(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders_q4")
    Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_q4")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders_q4 o
        |WHERE EXISTS (SELECT 1 FROM lineitem_q4 l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Approximate aggregates — the sketches that replace exact forms at
    * 100 TB: HLL++ distinct counts (constant memory vs a distinct
    * shuffle) and quantile sketches. No oracle (sketch values are
    * engine-specific); the ScalaTest asserts bounded relative error vs
    * the exact answers.
    */
  def approxDistincts(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .agg(
        // rsd 1%: tighter HLL registers; still constant memory per group
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        // ONE quantile sketch for both percentiles (two identical
        // percentile_approx aggs would each update their own sketch per row)
        percentile_approx(col("l_quantity"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("qs"))
      .select(
        col("approx_parts"), col("approx_supps"), col("approx_orders"),
        round(element_at(col("qs"), 1), 6).as("approx_median_qty"),
        round(element_at(col("qs"), 2), 6).as("approx_p95_qty"))

  /** Pivot: order counts per status, one column per priority (fixed
    * pivot values keep the schema static and the oracle expressible as
    * conditional aggregation).
    */
  private def ordersPivotCore(spark: SparkSession, d: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(spark, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderstatus").as("status"),
        col("1-URGENT").as("urgent"), col("2-HIGH").as("high"),
        col("3-MEDIUM").as("medium"), col("4-NOT SPECIFIED").as("unspecified"),
        col("5-LOW").as("low"))
  }

  def ordersPivot(spark: SparkSession, d: String): DataFrame =
    ordersPivotCore(spark, d).orderBy(col("status"))

  /** Unpivot/melt: the wide per-priority counts back to long form —
    * the inverse reshape (Spark's unpivot; UNION ALL in the oracle).
    * Built on the unsorted pivot core — its own ORDER BY supersedes any
    * inherited sort.
    */
  def ordersUnpivot(spark: SparkSession, d: String): DataFrame =
    ordersPivotCore(spark, d)
      .unpivot(
        Array(col("status")),
        Array(col("urgent"), col("high"), col("medium"), col("unspecified"), col("low")),
        "priority", "n_orders")
      .orderBy(col("status"), col("priority"))

  /** Distribution window functions (percent_rank / cume_dist / ntile) —
    * the analytic-function family not yet covered by the rank/lag suite.
    */
  def customerBalanceDistribution(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
    // round6Stable, not round(): cume_dist fractions land EXACTLY on
    // rounding ties (41/640 = 0.0640625) where Spark (HALF_UP) and
    // DuckDB (half-even) disagree
    Tables.customer(spark, d)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        round6Stable(percent_rank().over(w)).as("pct_rank"),
        round6Stable(cume_dist().over(w)).as("cume"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** Temporal arithmetic: ship latency (days between order and ship
    * date) distribution per order priority.
    */
  def shipLatency(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("lat"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        min(col("lat")).as("min_days"), max(col("lat")).as("max_days"),
        // mode-free rounding: int-sum/count can land exactly on a
        // 7-digit decimal tie when the count divides 10^7
        round6Stable(avg(col("lat"))).as("avg_days"))
      .orderBy(col("o_orderpriority"))

  /** Sessionization: gap-based session windows per user (session extends
    * while each event arrives within the gap of the previous one), then
    * per-user session stats. The DuckDB oracle derives identical sessions
    * with the gaps-and-islands formulation (new session when the gap to
    * the previous event is >= the threshold — session_window's end bound
    * is exclusive).
    */
  def sessionStats(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))
      .orderBy(col("user_id"))

  /** Arbitrary GROUPING SETS (beyond rollup/cube) through the SQL surface. */
  def orderGroupingSets(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |       COALESCE(o_orderpriority, '(all)') AS priority,
        |       COUNT(*) AS n_orders
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** Exact interpolated percentiles per group (both engines use the
    * linear-interpolation definition: Spark `percentile`, DuckDB
    * `quantile_cont`).
    */
  def quantityPercentiles(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      // one value buffer per column (the array form), elements extracted
      // after the aggregate — scalar outputs only (the driver's pandas
      // compare cannot sort array cells)
      .agg(
        expr("percentile(l_quantity, array(0.5, 0.95))").as("q"),
        expr("percentile(l_extendedprice, array(0.99))").as("p"))
      .select(
        col("l_returnflag"),
        round(element_at(col("q"), 1), 6).as("median_qty"),
        round(element_at(col("q"), 2), 6).as("p95_qty"),
        round(element_at(col("p"), 1), 6).as("p99_price"))
      .orderBy(col("l_returnflag"))

  /** Multimodal plumbing as a query (rows-only check): documents become
    * opaque binary payloads (as real media would be), features extracted
    * per-partition through the codec seam (deterministic fake codec — no
    * media libs in the sandbox; the Spark-side schema/batching/output
    * contract is the real thing).
    */
  def mediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.ext.Multimodal
    val records = Tables.documents(spark, d)
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[Multimodal.MediaRecord]
    Multimodal.extractFeatures(records, dim = 16).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(aggregate(col("feature"), lit(0.0), (a, v) => a + v.cast("double")), 4)
          .as("feature_sum"))
      .orderBy(col("media_id"))
  }

  /** Perceptual hashes over the media view of the corpus (same opaque
    * payloads as [[mediaFeatures]]): the per-media half of the
    * LAION-style image dedup — the hash table downstream pipelines
    * band-join for near-dup pairs ([[graft.ext.Multimodal.phashNearDups]],
    * whose pair output is legitimately EMPTY on a corpus with no
    * near-identical payloads, so the never-empty hash table is the
    * registered query and the pair kernel is fixture-tested).
    */
  def mediaPhash(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.ext.Multimodal
    val records = Tables.documents(spark, d)
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[Multimodal.MediaRecord]
    Multimodal.perceptualHashes(records).orderBy(col("media_id"))
  }

  /** Perceptual near-duplicate PAIRS over planted media — the pair half
    * of the LAION-style image dedup ([[mediaPhash]] is the hash table):
    * the corpus's documents viewed as opaque payloads, each planted
    * with a one-byte-perturbed copy
    * ([[graft.ext.Multimodal.plantedNearDupMedia]] — hamming ≤ 1 by
    * construction, so every planted pair sits inside the banding's
    * pigeonhole-exact ≤ 3 radius and must surface). Rows-only check:
    * the Dataset-typed perturbation isn't SQL-expressible, but the
    * planted-recall guarantee is asserted exactly in
    * CorpusAndSinksSpec and the dHash math itself is oracle-gated via
    * `q_media_phash`.
    */
  def mediaNearDupPairs(spark: SparkSession, d: String): DataFrame = {
    import graft.ext.Multimodal
    Multimodal.phashNearDups(
      Multimodal.plantedNearDupMedia(Tables.documents(spark, d)))
  }

  /** Media dedup clusters: min-label connected components over the
    * [[mediaNearDupPairs]] near-dup graph — the multimodal analogue of
    * the text-side q_neardup_clusters, sharing the graph family's ONE
    * propagation loop ([[graft.ext.Graph.minLabelComponentsOn]]).
    * Singleton media (nothing within the hamming radius) are their own
    * clusters; planted copy-pairs form 2-clusters unless chained by a
    * real near-dup.
    *
    * Scale shape: the pair table is banded (never all-pairs — the
    * phashNearDups pigeonhole join); propagation is O(diameter) keyed
    * rounds over pair-incident media only, frontier join-back at the
    * end.
    */
  /** Audio near-duplicate pairs over planted time-shifted media — the
    * chromaprint-style fingerprint dedup next to the image family's
    * dHash banding ([[mediaNearDupPairs]]): the corpus viewed as audio
    * payloads through the codec seam, each long-enough document
    * planted with a one-hop-shifted copy
    * ([[graft.ext.Multimodal.plantedShiftedAudio]]), matched on shared
    * 28-bit band-energy-delta fingerprint keys. Fully oracle-gated:
    * the DuckDB side replays frames, band energies, Haitsma–Kalker
    * sign bits, windowed keys, the stop-key cap, and the
    * shared-key-count threshold byte for byte from the same UTF-8
    * payloads.
    */
  def audioNearDupPairs(spark: SparkSession, d: String): DataFrame = {
    import graft.ext.Multimodal
    Multimodal.audioNearDupPairs(
      Multimodal.plantedShiftedAudio(Tables.documents(spark, d)))
  }

  def mediaDedupClusters(spark: SparkSession, d: String): DataFrame = {
    import graft.ext.Multimodal
    val media = Multimodal.plantedNearDupMedia(Tables.documents(spark, d))
    val pairs = Multimodal.phashNearDups(media)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint() // feeds both union branches — one evaluation
    val und = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    org.apache.spark.sql.GraftSql.releaseCheckpoint(pairs)
    graft.ext.Graph.minLabelComponentsOn(
        media.select(col("media_id").as("doc_id")).toDF(), und,
        graft.ext.Graph.ComponentRounds)
      .select(col("doc_id").as("media_id"), col("component").as("cluster"),
        col("component_size").as("cluster_size"))
  }

  /** parse_vn_date + stripDashRuns wired to a query: construct Vietnamese
    * legal-date strings from order dates (with a dash-run artifact),
    * normalize, parse back to DateType.
    */
  def vnDates(spark: SparkSession, d: String, limit: Int = 200): DataFrame = {
    val raw = Tables.orders(spark, d)
      .filter(col("o_orderkey") < limit)
      .select(col("o_orderkey"),
        concat(
          lit("Số: "), col("o_orderkey").cast("string"),
          lit("/QĐ-BTC ----- Hà Nội, ngày "), dayofmonth(col("o_orderdate")).cast("string"),
          lit(" tháng "), month(col("o_orderdate")).cast("string"),
          lit(" năm "), year(col("o_orderdate")).cast("string")).as("vn_text"))
    raw.select(
        col("o_orderkey"),
        TextExtract.stripDashRuns(col("vn_text")).as("clean_text"),
        TextExtract.parseVnDate(col("vn_text")).as("issue_date"))
      .orderBy(col("o_orderkey"))
  }

  /** The commerce funnel steps of [[eventFunnel]] — shared with the
    * oracle builder so the step list exists once.
    */
  private[graft] val FunnelSteps = Seq("view", "click", "purchase")

  /** Shared support threshold for [[frequentEventSequences]] — the oracle
    * SQL interpolates this same constant (the WinnowN discipline), so a
    * changed default cannot silently diverge operator and oracle.
    */
  private[graft] val SeqMinSupport = 0.02

  /** Ordered-funnel analysis over the events table: per step, how many
    * users reached it IN ORDER (each step's event strictly after the
    * user's entry into the previous step — the classic product-
    * analytics funnel, not a mere per-type distinct count: a user who
    * purchased before ever viewing does NOT convert here). Conversion
    * rates from the top of the funnel and from the previous step, 6-dp
    * exact-ratio snapped.
    *
    * Scale shape: one user-keyed aggregate per step, each computing the
    * earliest qualifying timestamp (MIN over a per-row predicate —
    * map-side combined), chained by a user-keyed join; step count is a
    * plan constant, so the whole funnel is |steps| keyed exchanges over
    * per-user rows, never a self-join of the raw event table. Timestamp
    * comparisons are exact (microsecond integers in both engines).
    */
  /** The per-step reached frames of the funnel fold: element k is the
    * per-user (user_id, t) table of users who reached step k in order,
    * with t their earliest qualifying time. Each frame is read twice
    * downstream (its own consumer + the next step's chain), so every
    * one is checkpointed — single evaluation structural (the
    * smoothedStatTable lesson); the frames are per-user rows, tiny
    * next to the event table they fold away. Shared by [[eventFunnel]]
    * and [[funnelLatency]] — one fold, no drift.
    */
  private def funnelReached(spark: SparkSession, d: String): Seq[DataFrame] = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    var reached = ev.filter(col("event_type") === lit(FunnelSteps.head))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t"))
      .localCheckpoint()
    val acc = scala.collection.mutable.ListBuffer(reached)
    FunnelSteps.drop(1).foreach { step =>
      val prev = reached.withColumnRenamed("t", "t_prev")
      reached = ev.filter(col("event_type") === lit(step))
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t"))
        .localCheckpoint()
      acc += reached
    }
    acc.toSeq
  }

  def eventFunnel(spark: SparkSession, d: String): DataFrame = {
    val frames = funnelReached(spark, d)
    val steps = frames.zip(FunnelSteps).zipWithIndex.map {
      case ((f, step), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit((i + 1).toLong).as("step"), lit(step).as("event_type"),
            col("n_users"))
    }.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("step")).rowsBetween(-1, -1)
    val top = org.apache.spark.sql.expressions.Window
      .orderBy(col("step"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def pct(num: org.apache.spark.sql.Column,
            den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(den > 0, floor(num.cast("double") / den * lit(1e6) + lit(0.5)) / lit(1e6))
        .otherwise(lit(0.0))
    steps
      .withColumn("conversion_from_top",
        pct(col("n_users"), first(col("n_users")).over(top)))
      .withColumn("conversion_from_prev",
        pct(col("n_users"),
          coalesce(first(col("n_users")).over(w), col("n_users"))))
      .orderBy(col("step"))
  }

  /** Time-to-convert statistics of the [[eventFunnel]]: over users who
    * completed the whole funnel, the elapsed time from their FIRST-step
    * entry to their final-step conversion — the product-analytics
    * latency companion to the step counts. One row:
    * (n_converted, min/max/median latency in exact microseconds, mean
    * 6-dp-snapped seconds). The median is the LOWER median (element at
    * rank ⌈n/2⌉ of the ascending sort) — deterministic in both engines,
    * no interpolation.
    *
    * Scale shape: two per-user frames joined user-keyed, one global
    * aggregate; the median rank window runs over converted users only
    * (funnel output, not the event table).
    */
  def funnelLatency(spark: SparkSession, d: String): DataFrame = {
    val frames = funnelReached(spark, d)
    val first = frames.head.withColumnRenamed("t", "t_first")
    val last = frames.last.withColumnRenamed("t", "t_last")
    val lat = first.join(last, Seq("user_id"))
      .select(col("user_id"),
        (unix_micros(col("t_last")) - unix_micros(col("t_first")))
          .as("latency_micros"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("latency_micros"), col("user_id"))
    val ranked = lat
      .withColumn("rk", row_number().over(w))
      .localCheckpoint() // read by the aggregate AND the median probe
    val agg = ranked.agg(
      count(lit(1)).as("n_converted"),
      min(col("latency_micros")).as("min_micros"),
      max(col("latency_micros")).as("max_micros"),
      (floor(sum(col("latency_micros")).cast("double") / count(lit(1)) +
        lit(0.5)) / lit(1e6)).as("mean_seconds"))
    val med = ranked.crossJoin(agg.select(col("n_converted").as("nn")))
      .filter(col("rk") ===
        floor((col("nn") + 1).cast("double") / lit(2.0)).cast("int"))
      .select(col("latency_micros").as("median_micros"))
    // LEFT join (not crossJoin): when zero users convert, `med` is empty
    // and a cross join would drop the output row, while the DuckDB
    // oracle's scalar subquery always yields 1 row with NULL stats —
    // the left join keeps both engines at exactly one row.
    agg.join(med, lit(true), "left")
      .select(col("n_converted"), col("min_micros"), col("max_micros"),
        col("median_micros"), col("mean_seconds"))
  }

  /** MARKET-BASKET association rules over lineitem (Agrawal & Srikant
    * 1994's support/confidence plus lift): part pairs co-purchased in
    * the same order, support ≥ 2, top 20 by (lift, support, keys).
    * Counts are exact integers; confidence and lift are exact-ratio
    * 6-dp snaps, ordered with full key tiebreaks so ranking is
    * engine-deterministic.
    *
    * Scale shape: the pair generator self-joins the DISTINCT
    * (order, part) table ON THE ORDER KEY — fan-out is C(items per
    * order, 2), a per-basket constant (TPC-H ≤ 7), never parts²; the
    * per-part counts join back keyed; the final is a bounded top-k.
    */
  def copurchaseRules(spark: SparkSession, d: String,
                      minSupport: Long = 2, k: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint() // read by the pair join (twice), counts, total
    val nOrders = li.select(col("o")).distinct().count()
    val partCnt = li.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
    val a = li.select(col("o"), col("p").as("part_a"))
    val b = li.select(col("o"), col("p").as("part_b"))
    val pairs = a.join(b, Seq("o"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    def snap6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    pairs
      .join(partCnt.select(col("p").as("part_a"), col("n_p").as("n_a")), Seq("part_a"))
      .join(partCnt.select(col("p").as("part_b"), col("n_p").as("n_b")), Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("support"), col("n_a"), col("n_b"),
        snap6(col("support").cast("double") / col("n_a")).as("confidence_ab"),
        snap6(lit(nOrders.toDouble) * col("support") /
          (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("lift").desc, col("support").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** RFM SEGMENTATION over the events table (the classic
    * recency/frequency/monetary customer segmentation): per purchasing
    * user, days since last purchase (anchored at the corpus' max event
    * date — deterministic, no wall clock), purchase count, and micro-
    * snapped spend; each dimension scored 1–5 by exact NTILE with a
    * user_id tiebreak (5 = most recent / most frequent / top spend),
    * concatenated into the segment code ("555" = champions).
    *
    * Exactness: recency/frequency are integers; spend snaps each
    * event's DOUBLE value to micro-units BEFORE the sum (order-free
    * BIGINT); NTILE over (metric, user_id) is engine-identical.
    *
    * Scale shape: one event aggregate to a per-user frame (orders of
    * magnitude smaller than the event table), then three rank windows
    * over THAT frame; at extreme user counts the scores would come
    * from broadcast quantile thresholds (the q_curriculum_order
    * idiom) — the exact-NTILE form is the analytics/audit shape.
    */
  def rfmSegments(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val anchor = ev.agg(max(col("ts")).cast("date").as("a"))
    val users = ev.filter(col("event_type") === lit("purchase"))
      .groupBy(col("user_id"))
      .agg(max(col("ts")).cast("date").as("last_purchase"),
        count(lit(1)).as("frequency"),
        sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
          .as("monetary_micro"))
      .crossJoin(anchor)
      .select(col("user_id"),
        datediff(col("a"), col("last_purchase")).cast("long").as("recency_days"),
        col("frequency"), col("monetary_micro"))
    def sc(order: org.apache.spark.sql.Column*) =
      ntile(5).over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
        .cast("long")
    users
      .withColumn("r_score", sc(col("recency_days").desc, col("user_id")))
      .withColumn("f_score", sc(col("frequency"), col("user_id")))
      .withColumn("m_score", sc(col("monetary_micro"), col("user_id")))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy(col("user_id"))
  }

  /** Per-user ACTIVITY ANOMALIES: days where a user's event count
    * deviates from their own baseline by more than 3 robust deviations
    * — median/MAD (both LOWER medians, rank ⌈n/2⌉ with a day tiebreak)
    * instead of mean/stddev, so one burst day cannot inflate its own
    * threshold. The abuse/ingest-spike audit, ENTIRELY in integers:
    * counts, medians, absolute deviations and the 3·max(MAD, 1)
    * threshold are all BIGINT — no FP anywhere, the replay is exact by
    * construction.
    *
    * Scale shape: one (user, day) aggregate off the event table, then
    * two per-user rank windows over the per-user-day frame (bounded by
    * days-per-user, never the raw events) and two keyed joins; output
    * only the flagged rows.
    */
  def activityAnomalies(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint() // read by the median pass, the dev pass, the output
    def lowerMedian(df: DataFrame, value: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col(value), col("day"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
      df.withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(col("rk") ===
          floor((col("cnt") + 1).cast("double") / lit(2.0)).cast("int"))
        .select(col("user_id"), col(value).as(out))
    }
    val med = lowerMedian(daily, "n_events", "med")
    val dev = daily.join(med, Seq("user_id"))
      .withColumn("dev", abs(col("n_events") - col("med")))
    val mad = lowerMedian(dev.select(col("user_id"), col("day"), col("dev")),
      "dev", "mad")
    dev.join(mad, Seq("user_id"))
      .filter(col("dev") > lit(3L) * greatest(col("mad"), lit(1L)))
      .select(col("user_id"), col("day").cast("string").as("day"),
        col("n_events"), col("med"), col("mad"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Weekly cohort retention over the events table: users grouped by
    * the ISO week of their FIRST event; per (cohort, week offset), how
    * many of the cohort were active — the standard retention triangle.
    * All counts exact; retention 6-dp exact-ratio snapped. `date_trunc
    * ('week', ts)` starts Monday in both engines; offsets are exact
    * day-difference divisions (always multiples of 7).
    *
    * Scale shape: one user-keyed aggregate for cohort assignment, one
    * distinct (user, week) projection, one keyed join, one
    * (cohort, offset) aggregate — no windows over the event table.
    */
  def cohortRetention(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d).select(col("user_id"), col("ts"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / lit(7)).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week").cast("string").as("cohort_week"),
        col("week_offset"), col("n_active"), col("n_cohort"),
        (floor(col("n_active").cast("double") / col("n_cohort") * lit(1e6) +
          lit(0.5)) / lit(1e6)).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Attribution lookback window (hours) and the touch / conversion
    * event types — shared with the oracle.
    */
  private[graft] val AttributionLookbackH = 24
  private[graft] val AttributionConv = "purchase"
  private[graft] val AttributionTouch = Seq("view", "click", "signup")

  /** MARKETING-STYLE CONVERSION ATTRIBUTION — first-touch and
    * last-touch: for every conversion (purchase), find the same
    * user's touch events (view/click/signup) inside the
    * [[AttributionLookbackH]]-hour lookback, credit the earliest
    * (first-touch) and the latest (last-touch) one, and report per
    * (model, touch_type) the attributed-conversion count and its
    * share of ALL conversions — conversions with no in-window touch
    * credit the 'none' bucket, so each model's shares sum to 1. Ties
    * break on (ts, event_id), exact on both engines.
    *
    * Scale shape: the conversion×touch join is USER-KEYED (per-user
    * event counts are bounded by app mechanics — the q_session_stats
    * argument); the pick windows partition BY CONVERSION (≤ lookback
    * touches per partition); the final is a tiny (model, type)
    * aggregate. No event-table-wide window anywhere.
    */
  def conversionAttribution(spark: SparkSession, d: String): DataFrame =
    conversionAttributionDf(Tables.events(spark, d))

  /** Per-conversion credit rows (model, cid, touch_type, touch_id) —
    * the granularity the aggregate table rolls up, exposed so the
    * STREAMING attribution's batch-parity test compares pick-by-pick
    * (the streamingFunnel parity discipline), not just the counts.
    * touch_id is −1 on the 'none' bucket.
    */
  private[graft] def attributionPicksDf(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    val conv = ev.filter(col("event_type") === AttributionConv)
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"))
    val touch = ev.filter(col("event_type").isin(AttributionTouch: _*))
      .select(col("user_id").as("tuid"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("touch_type"))
    // the window predicate lives IN the join condition, so a
    // conversion with zero in-window touches still emits its one
    // unmatched (all-null) row and credits the 'none' bucket — a
    // post-join filter would silently drop it when the user has
    // out-of-window touches
    val joined = conv.join(touch,
      col("user_id") === col("tuid") &&
        col("tts") <= col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $AttributionLookbackH HOURS"),
      "left")
    def pick(model: String,
             ord: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cid")).orderBy(ord: _*)
      joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(lit(model).as("model"), col("cid"),
          coalesce(col("touch_type"), lit("none")).as("touch_type"),
          coalesce(col("tid"), lit(-1L)).as("touch_id"))
    }
    pick("first", Seq(col("tts").asc_nulls_last, col("tid")))
      .unionByName(pick("last", Seq(col("tts").desc_nulls_last, col("tid").desc)))
  }

  def conversionAttributionDf(events: DataFrame): DataFrame = {
    val total = events.filter(col("event_type") === AttributionConv)
      .agg(count(lit(1)).as("n_conv"))
    attributionPicksDf(events)
      .groupBy(col("model"), col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
      .crossJoin(broadcast(total))
      .select(col("model"), col("touch_type"), col("n_conversions"),
        (floor(col("n_conversions").cast("double") / col("n_conv").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("share_r"))
      .orderBy(col("model"), col("touch_type"))
  }
}

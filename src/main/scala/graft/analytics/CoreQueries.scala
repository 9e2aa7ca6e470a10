package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's own analytics surface (SURVEY.md §2.6–§2.8), re-expressed
  * over the driver test tables. `documents(source, text, n_chars)` stands in
  * for the ingested corpus (`domain`, `content`) — see FIXTURES.md §B.
  *
  * All queries end in a deterministic total ORDER BY so the driver's
  * hash-compare is stable; double aggregates go through [[dsum]]/[[davg]].
  */
object CoreQueries {

  /** Flagship: docs + total chars per domain, largest first.
    * Reference: `spark/consumer.py:53-54` (A1/O1) + `spark/visualize.py:40-43` (A2).
    * Scale: single hash-aggregate with map-side partial agg; the shuffle is
    * on `source` (low cardinality) — no wide data movement.
    */
  def domainStats(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("n_chars")).as("total_chars"),
        sum(length(col("text")).cast("long")).as("total_text_chars")
      )
      .orderBy(col("doc_count").desc, col("source"))

  /** Global descriptive stats of content length in one pass.
    * Reference: `spark/consumer.py:71-76` (A3).
    */
  def globalSizeStats(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(length(col("text")).as("len"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("len")).as("min_size"),
        max(col("len")).as("max_size"),
        sum(col("len")).as("total_size"),
        (sum(col("len")).cast("double") / count(lit(1))).as("avg_size")
      )

  /** Top-10 domains by doc count. Reference: `spark/export_stats.py:96-98` (O3).
    * Catalyst plans this as TakeOrderedAndProject — no full sort at scale.
    */
  def topkDomains(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("source"))
      .limit(10)

  /** Deterministic 5-document sample with content preview.
    * Reference: `spark/consumer.py:84-93` (O2/P5/T2) — sample + substring(100).
    */
  def sampleDocs(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(
        col("doc_id"), col("source"), col("lang"),
        concat(substring(col("text"), 1, 100), lit("...")).as("preview")
      )
      .orderBy(col("doc_id"))
      .limit(5)

  /** Null-rejecting projection — the consumer's P1–P4 plan shape.
    * Reference: `spark/consumer.py:132-146`.
    */
  def filteredProjection(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .filter(col("source").isNotNull && col("lang").isNotNull && col("n_chars").isNotNull)
      .orderBy(col("doc_id"))

  /** Length histogram: docs bucketed by 100-char bins (descriptive-stats
    * extension of A3; same shape as the reference's size_stats roll-up).
    */
  def lengthHistogram(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(floor(col("n_chars") / 100).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("bucket"))

  /** JSON decode of a payload column with an explicit schema (J1) + grouped
    * agg. Reference: `spark/consumer.py:134` (`from_json` w/ declared schema).
    * `events.props` is the JSON column in the test data.
    */
  def jsonExtractStats(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(
        col("event_type"),
        from_json(col("props"), graft.model.Schemas.eventProps).getField("k").as("k")
      )
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k")
      )
      .orderBy(col("event_type"))

  /** Cross-batch roll-up analogue (A5/A6): per-day event totals then
    * per-type share. Reference: `spark/export_stats.py:81,89-92`.
    */
  def eventTypeRollup(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value")
      )
      .orderBy(col("event_type"))

  /** Tumbling event-time window counts — the reference's declared-but-unbuilt
    * intent (unused `window` import, `spark/consumer.py:5`; SURVEY §2.9/§2.11).
    * Batch form here; streaming form in graft.streaming.
    */
  def tumblingWindowCounts(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n_events"), col("total_value")
      )
      .orderBy(col("win_start"), col("event_type"))

  /** Monthly order roll-up (date_trunc analytics over the orders table). */
  def monthlyOrders(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("month"))
}

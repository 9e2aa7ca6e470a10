package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality expectations over the relational tables —
  * the Deequ-style validation battery (Schelter et al., "Automating
  * Large-Scale Data Quality Verification", VLDB 2018) a pipeline runs
  * against every ingested snapshot before anything downstream trusts
  * it. Each expectation is a named rule with the rows it checked, the
  * rows violating it, and the 6-dp pass rate; the battery covers the
  * rule CLASSES that matter (completeness, range, uniqueness,
  * referential integrity, cross-column consistency), one of each per
  * table where it is meaningful.
  *
  * Scale shape: ONE aggregate pass per table (each rule is a
  * conditional-sum column in its table's single agg, fanned out to
  * rows by an explode over a literal array — no per-rule scans), plus
  * one broadcast-or-shuffle anti-join per referential rule keyed on
  * the foreign key. Nothing corpus-sized crosses the wire twice.
  */
object Expectations {

  /** One rule row: (rule, n_checked, n_violations). */
  private def ruleRows(agg: DataFrame, rules: (String, String, String)*): DataFrame =
    agg.select(explode(array(rules.map { case (name, checked, violations) =>
      struct(lit(name).as("rule"), col(checked).as("n_checked"),
        col(violations).as("n_violations"))
    }: _*)).as("r")).select(col("r.rule"), col("r.n_checked"), col("r.n_violations"))

  def dataQualityAudit(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d)
    val cust = Tables.customer(spark, d)
    val docs = Tables.documents(spark, d)
    val ev = Tables.events(spark, d)

    def viol(c: Column): Column = sum(when(c, lit(1L)).otherwise(lit(0L)))

    val liRules = ruleRows(
      li.agg(count(lit(1)).as("n"),
        viol(!col("l_quantity").between(1, 50)).as("v_qty"),
        viol(col("l_extendedprice") < 0).as("v_price"),
        viol(!col("l_discount").between(0, 1)).as("v_disc")),
      ("lineitem.quantity_in_1_50", "n", "v_qty"),
      ("lineitem.extendedprice_nonneg", "n", "v_price"),
      ("lineitem.discount_in_0_1", "n", "v_disc"))
    val ordRules = ruleRows(
      ord.agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"),
        viol(col("o_totalprice") < 0).as("v_total")),
      ("orders.orderkey_unique", "n", "v_dup"),
      ("orders.totalprice_nonneg", "n", "v_total"))
    val docRules = ruleRows(
      docs.agg(count(lit(1)).as("n"),
        viol(col("text").isNull).as("v_null"),
        viol(coalesce(length(col("text")), lit(0)).cast("long") =!=
          col("n_chars")).as("v_nchars")),
      ("documents.text_complete", "n", "v_null"),
      ("documents.nchars_matches_text", "n", "v_nchars"))
    val evRules = ruleRows(
      ev.agg(count(lit(1)).as("n"),
        viol(col("event_type").isNull || col("ts").isNull).as("v_key")),
      ("events.type_and_ts_complete", "n", "v_key"))

    // referential integrity: orphan foreign keys via LEFT ANTI joins —
    // the primary-key side is dimension-sized, so at scale these are
    // the broadcast-anti shape (AQE picks it; the fact side never
    // shuffles twice)
    def refRule(name: String, fact: DataFrame, fk: Column,
                dim: DataFrame, pk: Column): DataFrame = {
      val total = fact.agg(count(lit(1)).as("n"))
      val orphans = fact.join(dim, fk === pk, "left_anti")
        .agg(count(lit(1)).as("v"))
      total.crossJoin(orphans).select(lit(name).as("rule"),
        col("n").as("n_checked"), col("v").as("n_violations"))
    }
    val refs =
      refRule("lineitem.orderkey_refs_orders", li, col("l_orderkey"),
        ord, col("o_orderkey"))
        .union(refRule("orders.custkey_refs_customer", ord, col("o_custkey"),
          cust, col("c_custkey")))

    liRules.union(ordRules).union(docRules).union(evRules).union(refs)
      .withColumn("pass_rate",
        when(col("n_checked") > 0,
          floor((col("n_checked") - col("n_violations")).cast("double") /
            col("n_checked") * lit(1e6) + lit(0.5)) / lit(1e6))
          .otherwise(lit(1.0)))
      .orderBy(col("rule"))
  }
}

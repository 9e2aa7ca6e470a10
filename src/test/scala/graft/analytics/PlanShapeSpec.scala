package graft.analytics

import graft.{SparkEntry, SparkTestBase}

/** Plan-shape regression guards: the scale properties the headline
  * queries rely on (pushdown, pruning, broadcast) asserted against the
  * actual physical plans, so a refactor that silently drops one fails
  * here instead of at 100 TB.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q3_shipping: filters pushed to scans, dims broadcast") {
    val p = plan("q3_shipping")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"customer filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q1_pricing_summary: shipdate predicate reaches the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"lineitem filter not pushed:\n$p")
  }

  test("q_domain_stats: scan reads only the referenced columns") {
    val p = plan("q_domain_stats")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && readSchema.contains("source") &&
      !readSchema.contains("lang") && !readSchema.contains("doc_id"),
      s"column pruning regressed: $readSchema")
  }

  test("q_minhash_pairs: signature stage has no shuffle before banding") {
    // the one Exchange pair must be the band-bucket self-join (plus the
    // final sort); a groupBy sneaking back into signature computation
    // would add more
    val p = plan("q_minhash_pairs")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 4, s"unexpected shuffles ($exchanges) in:\n$p")
  }

  test("q_asof_join: single shuffle on user_id, no row explosion operators") {
    val p = plan("q_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not all-pairs:\n$p")
  }
}

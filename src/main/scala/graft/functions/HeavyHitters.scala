package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries sketch state: parallel (value, lower-bound-count) arrays,
  * at most k-1 entries. A Product of native array types so the buffer
  * rides Spark's ExpressionEncoder as `struct<values:array<string>,
  * counts:array<bigint>>` — serialized with codegen'd converters at
  * partial-aggregate shuffle boundaries instead of kryo object graphs
  * (the round-2 perf wart on q_hot_terms).
  */
case class MGState(values: Array[String], counts: Array[Long])

/** Misra-Gries heavy-hitters sketch as a typed Aggregator (SURVEY §2.13:
  * the `Aggregator[IN, BUF, OUT]` extension seam). Finds every value
  * occurring more than n/k times in a group using O(k) state per group —
  * the constant-memory alternative to a full `groupBy(value).count()`
  * when the value domain is unbounded (per-domain hot terms, hot join
  * keys) at 100 TB.
  *
  * Guarantee (preserved under Spark's partial-aggregate merges — the
  * sketch merges by summandwise add + joint decrement, the mergeable-
  * summaries construction): any value with true count > n/k survives to
  * the output. Retained counts are lower bounds, not exact — callers
  * re-count survivors exactly when exact frequencies matter (two narrow
  * passes instead of one unbounded-cardinality shuffle).
  *
  * Output is a deterministic string "v1=c1;v2=c2;..." sorted by
  * (count desc, value) — survivor SET is the guarantee; counts/order of
  * equal-count entries depend on partitioning like any MG sketch.
  */
class HeavyHitters(k: Int) extends Aggregator[String, MGState, String] {

  override def zero: MGState = MGState(Array.empty, Array.empty)

  /** Entries with count > by survive with count - by (the MG decrement). */
  private def decremented(s: MGState, by: Long): MGState = {
    var n = 0
    var i = 0
    while (i < s.counts.length) { if (s.counts(i) > by) n += 1; i += 1 }
    val vs = new Array[String](n)
    val cs = new Array[Long](n)
    var j = 0
    i = 0
    while (i < s.counts.length) {
      if (s.counts(i) > by) { vs(j) = s.values(i); cs(j) = s.counts(i) - by; j += 1 }
      i += 1
    }
    MGState(vs, cs)
  }

  override def reduce(buf: MGState, value: String): MGState = {
    if (value == null) buf
    else {
      var i = 0 // linear probe: k is small, arrays beat hash churn
      while (i < buf.values.length && buf.values(i) != value) i += 1
      if (i < buf.values.length) { buf.counts(i) += 1; buf } // in-place OK per Aggregator contract
      else if (buf.values.length < k - 1)
        MGState(buf.values :+ value, buf.counts :+ 1L)
      else decremented(buf, 1L) // the MG joint-decrement step
    }
  }

  override def merge(a: MGState, b: MGState): MGState = {
    val sums = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < a.values.length) { sums.merge(a.values(i), a.counts(i), _ + _); i += 1 }
    i = 0
    while (i < b.values.length) { sums.merge(b.values(i), b.counts(i), _ + _); i += 1 }
    val vs = new Array[String](sums.size)
    val cs = new Array[Long](sums.size)
    var j = 0
    sums.forEach { (v, c) => vs(j) = v; cs(j) = c; j += 1 }
    val combined = MGState(vs, cs)
    if (cs.length < k) combined
    else {
      val kth = cs.sorted(Ordering[Long].reverse)(k - 1)
      decremented(combined, kth)
    }
  }

  override def finish(buf: MGState): String =
    buf.values.zip(buf.counts).sortBy { case (v, c) => (-c, v) }
      .map { case (v, c) => s"$v=$c" }.mkString(";")

  override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Survivor-SET variant: same sketch, but finishes to the bare term
  * array (sorted for determinism of the array itself; the retained
  * counts — the partitioning-dependent part — are dropped). This is the
  * pass-1 output of the exact two-pass pattern: the survivor superset
  * feeds a semi-join + exact recount, avoiding a lossy round-trip
  * through the "v=c;..." display string (terms may contain '=' or ';').
  */
class HeavyHitterTerms(k: Int) extends Aggregator[String, MGState, Seq[String]] {
  private val inner = new HeavyHitters(k)
  override def zero: MGState = inner.zero
  override def reduce(b: MGState, v: String): MGState = inner.reduce(b, v)
  override def merge(a: MGState, b: MGState): MGState = inner.merge(a, b)
  override def finish(buf: MGState): Seq[String] = buf.values.toSeq.sorted
  override def bufferEncoder: Encoder[MGState] = inner.bufferEncoder
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object HeavyHitters {
  /** Column form: usable directly in `.agg(...)`. */
  def heavyHitters(c: Column, k: Int): Column =
    udaf(new HeavyHitters(k), Encoders.STRING).apply(c)

  /** Survivor-terms column form (exact two-pass, pass 1). */
  def heavyHitterTerms(c: Column, k: Int): Column =
    udaf(new HeavyHitterTerms(k), Encoders.STRING).apply(c)
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  private def decrement(m: Map[String, Long], by: Long): Map[String, Long] =
    m.flatMap { case (v, c) => if (c > by) Some(v -> (c - by)) else None }

  override def reduce(buf: Map[String, Long], value: String): Map[String, Long] = {
    if (value == null) buf
    else buf.get(value) match {
      case Some(c) => buf.updated(value, c + 1)
      case None if buf.size < k - 1 => buf.updated(value, 1L)
      case None => decrement(buf, 1L) // the MG joint-decrement step
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = (a.keySet ++ b.keySet).iterator
      .map(v => v -> (a.getOrElse(v, 0L) + b.getOrElse(v, 0L))).toMap
    if (combined.size < k) combined
    else {
      val kth = combined.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      decrement(combined, kth)
    }
  }

  override def finish(buf: Map[String, Long]): String =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }
      .map { case (v, c) => s"$v=$c" }.mkString(";")

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object HeavyHitters {
  /** Column form: usable directly in `.agg(...)`. */
  def heavyHitters(c: Column, k: Int): Column =
    udaf(new HeavyHitters(k), Encoders.STRING).apply(c)
}

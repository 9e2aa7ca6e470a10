package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The winnowing selection kernel (Schleimer et al. 2003, §4: robust
  * winnowing) over a primitive hash array — the single implementation
  * shared by the property-tested pure API ([[graft.ext.Cleaning.winnowSelect]]
  * delegates here) and the codegen'd expression below.
  */
object WinnowKernel {

  /** Selected POSITIONS (0-based) into `hashes`: in every window of `w`
    * consecutive hashes the minimum is selected (rightmost on ties), and
    * consecutive windows sharing their minimum record it once.
    */
  def selectPositions(hashes: Array[Long], w: Int): Array[Int] = {
    require(w >= 1, s"window must be >= 1, got $w")
    val n = hashes.length
    if (n == 0) return Array.emptyIntArray
    val lastStart = math.max(n - w, 0)
    val tmp = new Array[Int](lastStart + 1)
    var k = 0
    var last = -1
    var s = 0
    while (s <= lastStart) {
      val e = math.min(s + w, n)
      var best = s
      var i = s + 1
      while (i < e) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      if (best != last) { tmp(k) = best; k += 1; last = best }
      s += 1
    }
    java.util.Arrays.copyOf(tmp, k)
  }

  /** ArrayData-in/ArrayData-out form the generated code calls: one
    * primitive copy in (`toLongArray` — no per-element boxing), selection,
    * one Unsafe primitive array out. Null elements are not expected
    * (span hashes are dense); a null input is handled by the expression's
    * null-safe contract before this is reached.
    */
  def selectHashes(in: ArrayData, w: Int): ArrayData = {
    val hs = in.toLongArray()
    val pos = selectPositions(hs, w)
    val out = new Array[Long](pos.length)
    var i = 0
    while (i < pos.length) { out(i) = hs(pos(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Winnowed fingerprint selection as a NATIVE Catalyst expression.
  *
  * The previous Scala-UDF form was the measured hot spot of the winnow
  * family at sf0.1: a UDF returning `(Long, Array[Long])` forces a
  * deserialize→box→re-serialize round trip per document, and `explode`
  * over the UDF-produced array ran ~5× slower than exploding the
  * codegen'd span-hash array it was derived from (3.15 s vs 0.67 s with
  * no shuffle in either plan). This expression stays inside whole-stage
  * codegen: the generated code hands the Tungsten array straight to
  * [[WinnowKernel.selectHashes]] and gets an Unsafe primitive array
  * back — no boxing, no codegen fence, nothing widening the plan.
  *
  * `n_spans` (the UDF's former first tuple slot) is `size()` of the same
  * materialized span-hash column — see the call sites in
  * [[graft.ext.Cleaning]], which bind the span-hash array to an attribute
  * so neither branch recomputes the xxhash transform.
  */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (w < 1) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName window must be >= 1, got $w")
    } else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> input, got ${other.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    WinnowKernel.selectHashes(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowKernel.selectHashes($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  /** Column form: selected fingerprint hashes of a span-hash array. */
  def winnowFingerprints(spanHashes: Column, w: Int): Column =
    GraftSql.column(WinnowFingerprints(GraftSql.expression(spanHashes), w))
}

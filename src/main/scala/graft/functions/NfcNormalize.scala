package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Replaces the Scala-UDF form (graft.extract.TextExtract kept it as
  * the one documented UDF exception): the UDF boxed every row through
  * a String encoder round-trip AND closed the whole-stage-codegen span
  * it appeared in — and it sits on the hottest kernel in the engine,
  * the canonical content hash (`md5(nfc(text))`) every exact-dedup
  * query shuffles by. As an Expression the fast paths return the
  * INPUT UTF8String untouched: pure-ASCII input (NFC-invariant)
  * short-circuits on a raw byte scan with no decode at all, and
  * already-normalized non-ASCII input pays only the decode for the
  * `Normalizer.isNormalized` check; the codegen body is one static
  * call, so the surrounding projection stays inside one codegen span.
  *
  * Semantics are bit-identical to the UDF (same platform
  * `java.text.Normalizer`, NFC form, null -> null), so every oracle
  * that mirrors it as DuckDB `nfc_normalize(text)` is unaffected.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Shared by interpreted eval and codegen. Two fast paths: pure
    * ASCII (NFC-invariant by definition) returns the input from a raw
    * byte scan with NO decode or allocation; otherwise the decoded
    * string is checked with `Normalizer.isNormalized` (already-NFC
    * returns the input reference, paying only the decode).
    */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    GraftSql.column(NfcNormalizeExpr(GraftSql.expression(c)))
}

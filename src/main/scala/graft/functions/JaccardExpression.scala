package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Jaccard similarity of two SORTED, DISTINCT string arrays as a single
  * codegen'd merge walk: |A ∩ B| / |A ∪ B| in O(|A|+|B|) with zero
  * allocations. Replaces `size(array_intersect)/size(array_union)`,
  * which builds two hash sets and two output arrays per evaluated pair —
  * the dominant cost of the all-pairs verification kernel. Counts are
  * identical (set semantics on distinct inputs), so oracle hash-compares
  * are unaffected. Inputs MUST be array_sort(array_distinct(...)).
  */
case class JaccardSortedArrays(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted_arrays"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  // Null ELEMENTS are skipped (treated as absent from the set): the
  // expression is SQL-reachable via GraftExtensions, so a caller passing
  // array('a', NULL) must not NPE (interpreted) or read an undefined
  // slot (codegen). The engine-side callers never produce null elements;
  // the guards are for the ad-hoc SQL surface.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var nxe = 0
    var nye = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { inter += 1; nxe += 1; nye += 1; i += 1; j += 1 }
        else if (c < 0) { nxe += 1; i += 1 }
        else { nye += 1; j += 1 }
      }
    }
    while (i < nx) { if (!x.isNullAt(i)) nxe += 1; i += 1 }
    while (j < ny) { if (!y.isNullAt(j)) nye += 1; j += 1 }
    val union = nxe + nye - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      val nxe = ctx.freshName("nxe")
      val nye = ctx.freshName("nye")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0; int $nxe = 0; int $nye = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $inter++; $nxe++; $nye++; $i++; $j++; }
         |    else if ($c < 0) { $nxe++; $i++; } else { $nye++; $j++; }
         |  }
         |}
         |while ($i < $nx) { if (!$a.isNullAt($i)) $nxe++; $i++; }
         |while ($j < $ny) { if (!$b.isNullAt($j)) $nye++; $j++; }
         |int $union = $nxe + $nye - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : (double) $inter / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Set-overlap counts of two SORTED, DISTINCT string arrays as one
  * codegen'd merge walk: struct(n_inter, n_a, n_b), from which callers
  * derive Jaccard, both CONTAINMENT directions (|A∩B|/|A| and
  * |A∩B|/|B| — the asymmetric measure that catches a short document
  * quoted inside a long one, where Jaccard is diluted by the long
  * side), and overlap coefficients — without walking the pair once per
  * measure. Same null-element and ordering contract as
  * [[JaccardSortedArrays]].
  */
case class OverlapCountsSortedArrays(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = StructType(Seq(
    StructField("n_inter", IntegerType, nullable = false),
    StructField("n_a", IntegerType, nullable = false),
    StructField("n_b", IntegerType, nullable = false)))
  override def prettyName: String = "overlap_counts_sorted_arrays"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var nxe = 0
    var nye = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { inter += 1; nxe += 1; nye += 1; i += 1; j += 1 }
        else if (c < 0) { nxe += 1; i += 1 }
        else { nye += 1; j += 1 }
      }
    }
    while (i < nx) { if (!x.isNullAt(i)) nxe += 1; i += 1 }
    while (j < ny) { if (!y.isNullAt(j)) nye += 1; j += 1 }
    InternalRow(inter, nxe, nye)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val c = ctx.freshName("c")
      val nxe = ctx.freshName("nxe")
      val nye = ctx.freshName("nye")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0; int $nxe = 0; int $nye = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $inter++; $nxe++; $nye++; $i++; $j++; }
         |    else if ($c < 0) { $nxe++; $i++; } else { $nye++; $j++; }
         |  }
         |}
         |while ($i < $nx) { if (!$a.isNullAt($i)) $nxe++; $i++; }
         |while ($j < $ny) { if (!$b.isNullAt($j)) $nye++; $j++; }
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $inter, $nxe, $nye });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardExpression {
  def jaccardSorted(a: Column, b: Column): Column =
    GraftSql.column(JaccardSortedArrays(GraftSql.expression(a), GraftSql.expression(b)))

  def overlapCounts(a: Column, b: Column): Column =
    GraftSql.column(OverlapCountsSortedArrays(GraftSql.expression(a), GraftSql.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared analysis-time guard: these kernels read Tungsten float slots
  * directly, so anything but array<float> must be REJECTED at analysis
  * (a double array silently reinterpreted as floats would return
  * garbage, not an error). SQL callers cast explicitly:
  * `CAST(array(...) AS ARRAY<FLOAT>)`.
  */
private[functions] trait RequiresFloatArrays { self: Expression =>
  protected def floatArrayCheck(inputs: Seq[Expression]): TypeCheckResult = {
    val bad = inputs.find {
      case e => !e.dataType.isInstanceOf[ArrayType] ||
        e.dataType.asInstanceOf[ArrayType].elementType != FloatType
    }
    bad match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} requires array<float> arguments, got ${e.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** Native Catalyst expressions for the embedding kernels — the hot inner
  * ops of similarity search. Unlike a Scala UDF (which converts every
  * ArrayData to a boxed Seq[Float] per call), these run inside whole-stage
  * codegen directly over Tungsten array memory: no conversion, no boxing,
  * no codegen fence around the join that computes millions of pairs.
  *
  * FP semantics are pinned: sequential index-order accumulation in double,
  * matching both the previous UDF/fold forms and the DuckDB oracle's list
  * functions, so results are bit-identical. Null ELEMENTS inside a vector
  * are not expected (embedding arrays are dense); a null vector yields
  * null via the standard null-safe contract.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with RequiresFloatArrays {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"
  override def checkInputDataTypes(): TypeCheckResult = floatArrayCheck(Seq(left, right))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector; same accumulation contract as [[FloatVecDot]]. */
case class FloatVecNorm(child: Expression)
    extends UnaryExpression with RequiresFloatArrays {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_norm"
  override def checkInputDataTypes(): TypeCheckResult = floatArrayCheck(Seq(child))

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  def vecDot(a: Column, b: Column): Column =
    GraftSql.column(FloatVecDot(GraftSql.expression(a), GraftSql.expression(b)))

  def vecNorm(a: Column): Column =
    GraftSql.column(FloatVecNorm(GraftSql.expression(a)))
}

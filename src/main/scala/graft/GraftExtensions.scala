package graft

import org.apache.spark.sql.{GraftSql, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatVecDot, FloatVecNorm, JaccardSortedArrays}
import graft.extract.HtmlToMarkdown

/** SQL surface for graft's custom operators: the native expressions and
  * the html_to_markdown UDF become callable from `spark.sql(...)` text —
  * completing the ad-hoc SQL entry point (SURVEY §2.1 S3) for the
  * operators that aren't Spark built-ins.
  *
  * Two registration paths:
  *  - at session build: `.config("spark.sql.extensions",
  *    "graft.GraftExtensions")` (standard extensions hook);
  *  - on a running session: [[GraftExtensions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.expressions.foreach(ext.injectFunction)
}

object GraftExtensions {

  // 3-arg ExpressionInfo is (className, db, name) — the 11-arg positional
  // form puts db before name and is easy to misalign
  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getName, null, name)

  val expressions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_vec_dot"),
      info(classOf[FloatVecDot], "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    (FunctionIdentifier("float_vec_norm"),
      info(classOf[FloatVecNorm], "float_vec_norm"),
      (args: Seq[Expression]) => FloatVecNorm(args(0))),
    (FunctionIdentifier("jaccard_sorted_arrays"),
      info(classOf[JaccardSortedArrays], "jaccard_sorted_arrays"),
      (args: Seq[Expression]) => JaccardSortedArrays(args(0), args(1))),
    // the one UDF-backed function rides the same builder seam (as a real
    // catalyst ScalaUDF — a Column-API wrapper would embed an Unevaluable
    // column node in SQL-originated plans) so BOTH registration paths
    // expose the identical SQL surface
    (FunctionIdentifier("html_to_markdown"),
      info(HtmlToMarkdown.getClass, "html_to_markdown"),
      (args: Seq[Expression]) => {
        // arity-check here: toScalaUDF would otherwise defer the error
        // to execution as a ClassCastException inside the generated code
        require(args.length == 1,
          s"html_to_markdown requires exactly 1 argument, got ${args.length}")
        GraftSql.scalaUdfExpression(HtmlToMarkdown.htmlToMarkdown, args)
      })
  )

  /** Register everything into an already-running session. */
  def registerAll(spark: SparkSession): Unit =
    expressions.foreach { case (id, inf, builder) =>
      GraftSql.registerFunction(spark, id, inf, builder)
    }
}

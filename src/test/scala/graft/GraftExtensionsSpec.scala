package graft

/** The ad-hoc SQL surface for custom operators: after registration, the
  * native expressions and UDFs are callable from SQL text.
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("custom functions callable from spark.sql after registerAll") {
    GraftExtensions.registerAll(spark)
    val dot = spark.sql(
      "SELECT float_vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").collect().head.getDouble(0)
    assert(dot == 11.0)
    val nrm = spark.sql(
      "SELECT float_vec_norm(array(cast(3.0 as float), cast(4.0 as float))) AS n")
      .collect().head.getDouble(0)
    assert(nrm == 5.0)
    val jac = spark.sql(
      "SELECT jaccard_sorted_arrays(array('a','b','c'), array('b','c','d')) AS j")
      .collect().head.getDouble(0)
    assert(math.abs(jac - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}|
    val md = spark.sql(
      "SELECT html_to_markdown('<h1>Tiêu đề</h1><p>nội  dung</p>') AS md")
      .collect().head.getString(0)
    assert(md == "# Tiêu đề\n\nnội dung")
  }

  test("extensions-hook builder list covers html_to_markdown too") {
    // the spark.sql.extensions path injects exactly GraftExtensions
    // .expressions; the UDF must ride that list (not only registerAll),
    // and its builder must produce a working expression
    val entry = GraftExtensions.expressions
      .find(_._1.funcName == "html_to_markdown")
    assert(entry.isDefined, "html_to_markdown missing from the extensions list")
    val built = entry.get._3(Seq(
      org.apache.spark.sql.GraftSql.expression(
        org.apache.spark.sql.functions.lit("<h1>T</h1><p>a  b</p>"))))
    val out = spark.range(1)
      .select(org.apache.spark.sql.GraftSql.column(built).as("md"))
      .collect().head.getString(0)
    assert(out == "# T\n\na b")
  }

  test("jaccard_sorted_arrays skips null elements from SQL callers") {
    GraftExtensions.registerAll(spark)
    // null elements are set-absent: {a} vs {a,b} -> 1/2, both eval modes
    val j = spark.sql(
      "SELECT jaccard_sorted_arrays(array('a', CAST(NULL AS STRING)), " +
        "array('a','b')) AS j").collect().head.getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
    val allNull = spark.sql(
      "SELECT jaccard_sorted_arrays(array(CAST(NULL AS STRING)), " +
        "array(CAST(NULL AS STRING))) AS j").collect().head.getDouble(0)
    assert(allNull == 0.0) // empty-set convention, matches union==0 case
  }

  test("wrong input types are rejected at analysis, not silently reinterpreted") {
    GraftExtensions.registerAll(spark)
    // unannotated SQL literals are doubles — reading them as float slots
    // would return garbage, so this must FAIL analysis
    val e = intercept[Exception] {
      spark.sql("SELECT float_vec_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(e.getMessage.contains("array<float>") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT jaccard_sorted_arrays(array(1, 2), array(3, 4))").collect()
    }
    assert(e2.getMessage.contains("array<string>") ||
      e2.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("SQL-registered expression appears in a real query plan (codegen path)") {
    GraftExtensions.registerAll(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      """SELECT vec_id, round(float_vec_norm(embedding), 6) AS nrm
        |FROM emb_sql WHERE vec_id < 3 ORDER BY vec_id""".stripMargin).collect()
    assert(rows.length == 3 && rows.forall(_.getDouble(1) > 0.0))
  }
}

package graft.functions

import graft.SparkTestBase
import graft.ext.Corpus
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-K aggregator must compute EXACTLY the window
  * `ROW_NUMBER() OVER (PARTITION BY g ORDER BY key, id)` semantics —
  * under any partitioning (merge associativity) and any data (randomized
  * reduce/merge vs the sort-take reference).
  */
class TopKSampleSpec extends SparkTestBase {

  test("stratifiedSample equals the window top-K form") {
    val viaAgg = Corpus.stratifiedSample(spark, sfDir).collect().toSeq
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("source"), md5(col("text").cast("binary")).as("h"),
        col("doc_id"))
    val viaWindow = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= 20)
      .select(col("source"), col("rk").cast("int").as("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk")).collect().toSeq
    assert(viaAgg == viaWindow, "aggregator must match the window form")
    assert(viaAgg.nonEmpty, "fixture must produce sampled docs")
  }

  test("result is invariant under input partitioning") {
    import spark.implicits._
    val base = (1L to 500L).map(i => (s"g${i % 3}", f"k${(i * 37) % 101}%03d", i))
      .toDF("g", "h", "id")
    def sample(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g"))
      .agg(TopKSample.firstKByKey(col("h"), col("id"), 7).as("ids"))
      .orderBy(col("g")).collect().toSeq
    val one = sample(base.coalesce(1))
    val many = sample(base.repartition(13, col("id")))
    assert(one == many, "partial-merge order must not change the result")
  }

  test("non-BMP keys order like Spark's window (code points, not UTF-16 units)") {
    // U+FF61 sorts BELOW U+10000 in code-point/UTF-8 order, but its
    // UTF-16 encoding (0xFF61) is ABOVE the surrogate pair (0xD800...)
    // — String.compareTo would rank them backwards
    import spark.implicits._
    val df = Seq(
      ("g", "｡", 1L), ("g", new String(Character.toChars(0x10000)), 2L),
      ("g", "a", 3L), ("g", "𐀁x", 4L)
    ).toDF("g", "h", "id")
    val viaAgg = df.groupBy(col("g"))
      .agg(TopKSample.firstKByKey(col("h"), col("id"), 2).as("ids"))
      .select(explode(col("ids")).as("doc_id")).collect().toSeq.map(_.getLong(0))
    val viaWindow = df
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"), col("id"))))
      .filter(col("rk") <= 2).orderBy(col("rk"))
      .select(col("id")).collect().toSeq.map(_.getLong(0))
    assert(viaAgg == viaWindow,
      s"aggregator order must match Spark's string order: $viaAgg vs $viaWindow")
  }

  test("plan shape: partial aggregation runs BEFORE the group exchange") {
    // the scale property: map-side partials cap each partition's
    // contribution at k rows per group, so the exchange carries bounded
    // state — a plan where aggregation only happens after the shuffle
    // would silently ship every row
    val df = Corpus.stratifiedSample(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val firstAgg = plan.indexOf("ObjectHashAggregate")
    val lastAgg = plan.lastIndexOf("ObjectHashAggregate")
    val exchange = plan.indexOf("Exchange hashpartitioning(source")
    assert(firstAgg >= 0 && lastAgg > firstAgg && exchange >= 0,
      s"expected partial+final ObjectHashAggregate around a source exchange:\n$plan")
    // tree strings print parents first: final agg < exchange < partial agg
    assert(firstAgg < exchange && exchange < lastAgg,
      s"partial aggregate must sit below the exchange (map-side):\n$plan")
  }

  test("randomized reduce/merge matches sort-take (property)") {
    val rnd = new scala.util.Random(42)
    val agg = new TopKByKey(5)
    for (_ <- 1 to 200) {
      val rows = Seq.fill(rnd.nextInt(30))(
        (f"k${rnd.nextInt(12)}%02d", rnd.nextInt(20).toLong))
      // random partial/merge tree: split rows into chunks, reduce each,
      // merge left-to-right (Spark guarantees no more than this)
      val chunks = rows.grouped(math.max(1, rnd.nextInt(6) + 1)).toSeq
      val merged = chunks
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val expect = rows.sorted.take(5).map(_._2)
      assert(agg.finish(merged) == expect,
        s"rows=$rows chunks=${chunks.size}")
    }
  }
}

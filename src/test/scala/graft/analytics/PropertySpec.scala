package graft.analytics

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase
import graft.Tables

/** Relational invariants over the sf0.001 tables plus ScalaCheck
  * properties run programmatically (no scalatest bridge in the offline
  * cache — Test.check + assert(passed) gives the same guarantee).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("groupBy counts sum to the total count (documents)") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val grouped = docs.groupBy($"source").agg(count(lit(1)).as("c"))
      .agg(sum($"c")).collect().head.getLong(0)
    assert(grouped == total && total > 0)
  }

  test("min <= avg <= max on content length (documents)") {
    val r = Tables.documents(spark, sfDir)
      .select(length($"text").cast("double").as("len"))
      .agg(min($"len"), avg($"len"), max($"len")).collect().head
    assert(r.getDouble(0) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(2))
  }

  test("rollup contains the grand total and all leaf groups (orders)") {
    val roll = RelationalQueries.ordersRollup(spark, sfDir).collect()
    val leaf = roll.filter(r => r.getString(0) != "(all)" && r.getString(1) != "(all)")
    val grand = roll.filter(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") == leaf.map(_.getAs[Long]("n_orders")).sum)
  }

  test("semi + anti join partition customers exactly (same right side)") {
    val urgent = Tables.orders(spark, sfDir).filter($"o_orderpriority" === "1-URGENT")
    val semi = Tables.customer(spark, sfDir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi").count()
    val anti = RelationalQueries.antiJoinCustomers(spark, sfDir)
      .agg(coalesce(sum($"n_inactive_customers"), lit(0L))).collect().head.getLong(0)
    assert(semi + anti == Tables.customer(spark, sfDir).count())
    assert(semi > 0 && anti > 0, "both sides of the partition must be non-empty")
  }

  test("set ops: |A ∪ B| = |A| + |B| - |A ∩ B| over nation keys") {
    val u = RelationalQueries.setUnionNations(spark, sfDir).count()
    val i = RelationalQueries.setIntersectNations(spark, sfDir).count()
    val a = Tables.customer(spark, sfDir).select($"c_nationkey").distinct().count()
    val b = Tables.supplier(spark, sfDir).select($"s_nationkey").distinct().count()
    assert(u == a + b - i)
  }

  test("scalacheck: decimal-sum determinism — dsum equals BigDecimal fold") {
    val gen = Gen.listOfN(50, Gen.chooseNum(-99999.99, 99999.99))
    check(Prop.forAll(gen) { xs: List[Double] =>
      val rounded = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      val expected = rounded.sum.toDouble
      val got = xs.toDF("v").agg(dsum($"v")).collect().head.getDouble(0)
      got == expected
    }, n = 20)
  }

  test("scalacheck: normalizeWhitespace is idempotent and space-collapsing") {
    val ws = Gen.oneOf(' ', '\t', '\n')
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val textGen = Gen.listOfN(8, Gen.oneOf(word, ws.map(_.toString))).map(_.mkString)
    check(Prop.forAll(textGen) { s: String =>
      val out = Seq(s, s).toDF("t")
        .select(graft.extract.TextExtract.normalizeWhitespace($"t").as("n"))
        .collect().map(_.getString(0))
      val once = out(0)
      val twice = Seq(once).toDF("t")
        .select(graft.extract.TextExtract.normalizeWhitespace($"t"))
        .collect().head.getString(0)
      once == twice && !once.contains("  ") && !once.startsWith(" ") && !once.endsWith(" ")
    }, n = 20)
  }

  test("approx aggregates stay within error bounds of exact answers") {
    val approx = ExtraQueries.approxDistincts(spark, sfDir).collect().head
    val exact = RelationalQueries.distinctCounts(spark, sfDir).collect().head
    for ((a, e) <- Seq(
        (approx.getLong(0), exact.getLong(0)),
        (approx.getLong(1), exact.getLong(1)),
        (approx.getLong(2), exact.getLong(2)))) {
      assert(math.abs(a - e).toDouble / e < 0.05, s"HLL drifted: $a vs $e")
    }
    val exactQ = Tables.lineitem(spark, sfDir)
      .agg(expr("percentile(l_quantity, 0.5)"), expr("percentile(l_quantity, 0.95)"))
      .collect().head
    assert(math.abs(approx.getDouble(3) - exactQ.getDouble(0)) <= 1.0)
    assert(math.abs(approx.getDouble(4) - exactQ.getDouble(1)) <= 1.0)
  }

  test("window running total: last row per customer equals the customer's sum") {
    val rt = RelationalQueries.windowRunningTotal(spark, sfDir)
    val lastPerCust = rt.groupBy($"o_custkey")
      .agg(max(struct($"o_orderdate", $"o_orderkey", $"cum_spend")).as("m"))
      .select($"o_custkey", $"m.cum_spend".as("last_cum"))
    val direct = Tables.orders(spark, sfDir).groupBy($"o_custkey")
      .agg(dsum($"o_totalprice").as("total"))
    val joined = lastPerCust.join(direct, "o_custkey")
      .filter(abs($"last_cum" - $"total") > 1e-6)
    assert(joined.count() == 0)
  }

  test("scalacheck: both chunkers partition/cover every token count exactly") {
    // one Spark job over the generated lengths beats 100 tiny jobs; the
    // properties then check per-length in memory
    val lens = (1 to 400).toSeq
    val docs = lens.map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val fixed = graft.ext.Corpus.docChunksDf(docs, 64, 48).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).groupBy(_._1)
    val cdc = graft.ext.Corpus.cdcChunksDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).groupBy(_._1)
    lens.foreach { n =>
      // fixed windows: starts at 1 + k·48, every token covered, length
      // capped at 64, only the last chunk short
      val f = fixed(n.toLong).sortBy(_._2)
      assert(f.head._2 == 1 && f.last._2 + f.last._3 - 1 == n, s"fixed coverage at n=$n")
      f.zipWithIndex.foreach { case ((_, s, len), k) =>
        assert(s == 1 + 48L * k && len <= 64, s"fixed start/len at n=$n chunk $k")
        if (k < f.length - 1) assert(len == 64, s"only the last fixed chunk may be short (n=$n)")
      }
      // cdc: spans chain contiguously and partition 1..n exactly
      val c = cdc(n.toLong).sortBy(_._2)
      assert(c.head._2 == 1 && c.last._2 + c.last._3 - 1 == n, s"cdc coverage at n=$n")
      c.sliding(2).foreach {
        case Array(a, b) => assert(b._2 == a._2 + a._3, s"cdc chaining at n=$n")
        case _ =>
      }
      assert(c.map(_._3).sum == n, s"cdc lengths must sum to n=$n")
    }
  }
}

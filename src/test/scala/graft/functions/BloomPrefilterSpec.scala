package graft.functions

import graft.SparkTestBase
import graft.analytics.RelationalQueries
import graft.ext.Corpus
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The Bloom-prefilter contract: results are IDENTICAL to the exact
  * operator (no false negatives; false positives die in the exact join),
  * under both a well-sized sketch and a deliberately starved one, and
  * the construction stays lazy (the sketch is a plan subquery, not a
  * pre-collected literal).
  */
class BloomPrefilterSpec extends SparkTestBase {

  test("bloomSemiJoin matches the plain left-semi join exactly") {
    val part = graft.Tables.part(spark, sfDir)
    val li = graft.Tables.lineitem(spark, sfDir).filter(col("l_quantity") > 49)
    val viaBloom = RelationalQueries.bloomSemiJoinParts(spark, sfDir).collect().toSeq
    val plain = part
      .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey")).collect().toSeq
    assert(viaBloom == plain, "bloom prefilter must not change semi-join results")
    assert(viaBloom.nonEmpty, "fixture must produce matching parts")
  }

  test("bloomAntiJoin matches the plain left-anti join exactly, even with a starved sketch") {
    val part = graft.Tables.part(spark, sfDir)
    val li = graft.Tables.lineitem(spark, sfDir).filter(col("l_quantity") > 49)
    val plain = part
      .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey")).collect().toSeq
    val viaBloom = RelationalQueries.bloomAntiJoinParts(spark, sfDir).collect().toSeq
    assert(viaBloom == plain, "bloom prefilter must not change anti-join results")
    assert(viaBloom.nonEmpty, "fixture must produce non-matching parts")
    // a starved sketch sends (nearly) everything down the exact branch —
    // results must be unchanged, only the bypass fraction shrinks
    val starved = BloomPrefilter.bloomAntiJoin(part, li,
      "p_partkey", "l_partkey", expectedItems = 2L, numBits = 64L)
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey")).collect().toSeq
    assert(starved == plain,
      "anti-join results must be sketch-size-independent")
  }

  test("empty build side: anti keeps everything, semi keeps nothing (NULL sketch)") {
    // BloomFilterAggregate evaluates to NULL over zero rows; an unguarded
    // might_contain would null-propagate and drop BOTH complementary
    // branches of the anti-join (silently losing the whole left side)
    import spark.implicits._
    val left = (1L to 50L).toDF("id")
    val empty = Seq.empty[Long].toDF("k")
    val anti = BloomPrefilter.bloomAntiJoin(left, empty, "id", "k")
      .orderBy(col("id")).collect().toSeq
    assert(anti.map(_.getLong(0)) == (1L to 50L),
      "anti-join against an empty key set must keep every left row")
    val semi = BloomPrefilter.bloomSemiJoin(left, empty, "id", "k").collect()
    assert(semi.isEmpty,
      "semi-join against an empty key set must keep nothing")
  }

  test("same-named keys on both sides resolve (incremental-dedup shape)") {
    import spark.implicits._
    val batch = (1L to 40L).toDF("doc_id")
    val corpus = (30L to 100L).toDF("doc_id")
    val anti = BloomPrefilter.bloomAntiJoin(batch, corpus, "doc_id", "doc_id")
      .orderBy(col("doc_id")).collect().toSeq.map(_.getLong(0))
    assert(anti == (1L to 29L),
      "bloomAntiJoin must handle leftKey == rightKey without ambiguity")
    val semi = BloomPrefilter.bloomSemiJoin(batch, corpus, "doc_id", "doc_id")
      .orderBy(col("doc_id")).collect().toSeq.map(_.getLong(0))
    assert(semi == (30L to 40L),
      "bloomSemiJoin must handle leftKey == rightKey without ambiguity")
  }

  test("the sketch probe runs BELOW the join exchanges (pre-shuffle filter)") {
    // the whole point of the prefilter: might_contain must sit on the
    // scan side of every exchange, so at scale only survivors shuffle.
    // Disable broadcast so the exact join physically shuffles (the
    // at-scale shape; locally AQE would broadcast the tiny build side).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = RelationalQueries.bloomSemiJoinParts(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      // plain collect() stops at AQE stage boundaries — walk through them
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: allNodes(q.plan)
        case _ => p +: p.children.flatMap(allNodes)
      }
      val probeFilters = allNodes(plan).collect {
        case f: FilterExec
            if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
      }
      assert(probeFilters.nonEmpty, s"plan must contain the sketch probe:\n$plan")
      probeFilters.foreach { f =>
        assert(allNodes(f).drop(1)
          .collectFirst { case e: ShuffleExchangeLike => e }.isEmpty,
          s"probe filter must sit below every exchange:\n$plan")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bloom decontamination matches both exact paths, even with a starved sketch") {
    val exact = Corpus.decontaminationStats(spark, sfDir).collect().toSeq
    val viaBloom = Corpus.decontaminationStatsBloom(spark, sfDir).collect().toSeq
    assert(viaBloom == exact, "bloom path must reproduce the exact contamination report")
    assert(viaBloom.nonEmpty, "fixture must produce contaminated docs")
    // 64-bit sketch for tens of thousands of shingles: nearly every
    // probe is a false positive — the exact join must still kill them all
    val starved = Corpus.decontaminationStatsBloom(spark, sfDir,
      expectedShingles = 4L, numBits = 64L).collect().toSeq
    assert(starved == exact,
      "false positives from an undersized sketch must not leak into results")
  }

  test("the sketch is built distributed in a scalar subquery (lazy, fixed-size payload)") {
    // zero jobs at plan build: the filter bits live in the plan as an
    // uncorrelated scalar subquery, not a pre-collected literal (same
    // sentinel technique as CorpusSpec's laziness test)
    val tracker = spark.sparkContext.statusTracker
    def jobIds: Set[Int] = tracker.getJobIdsForGroup(null).toSet
    def awaitNewJob(base: Set[Int]): Unit = {
      val deadline = System.nanoTime() + 10e9.toLong
      while ((jobIds -- base).isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
    }
    // read the source OUTSIDE the measured region (spark.read.parquet
    // schema inference runs one footer-read job — a read-API cost, not
    // builder eagerness; same convention as CorpusSpec's laziness test)
    val docs = graft.Tables.documents(spark, sfDir)
    // drain the (async, ordered) listener bus: once this flush sentinel
    // is visible, every job from earlier tests is too — otherwise a
    // straggler event lands after the snapshot and fakes a builder job
    locally { val b = jobIds; spark.range(1).collect(); awaitNewJob(b) }
    val before = jobIds
    val df = Corpus.decontaminationStatsBloomDf(docs)
    spark.range(1).collect() // sentinel: shuffle-free -> exactly 1 job
    awaitNewJob(before)
    assert((jobIds -- before).size == 1,
      "building the bloom decontamination plan must launch zero jobs")
    // inspect the EXECUTED instance (collect, not write — see
    // PlanShapeSpec's AQE note): the plan must probe the sketch and
    // compute it as a plan subquery, not a pre-collected literal
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"plan must probe the sketch:\n$plan")
    assert(plan.contains("bloom_filter_agg") || plan.contains("Subquery"),
      s"sketch must be computed as a plan subquery:\n$plan")
  }

  test("mixturePlan allocates the budget by weight and caps rates at 1") {
    val rows = Corpus.mixturePlan(spark, sfDir, budgetTokens = 100000L).collect()
    assert(rows.nonEmpty)
    val totalW = rows.map(_.getAs[Double]("weight")).sum
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      val target = r.getAs[Long]("target_tokens")
      val rate = r.getAs[Double]("sample_rate")
      assert(math.abs(target - 100000L * w / totalW) <= 0.5 + 1e-9,
        s"target must be the rounded weight share: $r")
      assert(rate >= 0.0 && rate <= 1.0, s"rate out of range: $r")
      val unc = target.toDouble / r.getAs[Long]("n_tokens")
      assert(rate == math.rint(math.min(1.0, unc) * 1e6) / 1e6 ||
        math.abs(rate - math.min(1.0, unc)) < 1e-6,
        s"rate must be the capped target/actual ratio: $r")
    }
  }

  test("modelQualityFilter scores are valid probabilities consistent with kept") {
    val rows = graft.ext.TextAnalysis.modelQualityFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(1)).foreach { r =>
      val s = r.getDouble(1)
      assert(s >= 0.0 && s <= 1.0, s"sigmoid out of range: $r")
      assert((r.getInt(2) == 1) == (s >= 0.5), s"kept flag inconsistent: $r")
    }
    // both classes must be represented or the filter certifies nothing
    val kept = rows.filter(!_.isNullAt(2)).map(_.getInt(2)).toSet
    assert(kept == Set(0, 1), s"fixture must exercise both decisions, got $kept")
  }
}

package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Classifier training: the descent actually learns (accuracy over the
  * all-positive baseline), is partition-invariant (the integer-gradient
  * discipline), ignores constant features, and distills the rule it was
  * trained on.
  */
class TrainingSpec extends SparkTestBase {

  private def docs = graft.Tables.documents(spark, sfDir)

  private lazy val result =
    Training.trainQualityClassifierDf(spark, docs).collect()

  test("descent learns past the all-positive baseline within 4 epochs") {
    assert(result.length == 4)
    val n = result.head.getLong(2)
    // epoch 1's n_correct is evaluated under w=0 (σ=0.5 → predict all
    // positive): exactly the positive-label count — the baseline
    val base = result.head.getLong(1)
    val last = result.last.getLong(1)
    assert(last > base, s"no learning: epoch1 $base → epoch4 $last of $n")
    assert(last.toDouble / n > 0.9, s"final train accuracy ${last.toDouble / n}")
  }

  test("constant features keep zero weight (std guard, no NaN)") {
    // the fixture corpus has no punctuation → pr is constant 0 → its
    // standardized column is 0 and the weight must never move
    val wPr = result.map(_.getDouble(5))
    assert(wPr.forall(_ == 0.0), s"constant-feature weight moved: ${wPr.toSeq}")
    // and no weight is NaN (a broken std would poison all of them)
    for (r <- result; j <- 3 to 7) assert(!r.getDouble(j).isNaN)
  }

  test("training is partition-invariant (integer gradient sums)") {
    val a = Training.trainQualityClassifierDf(spark, docs.repartition(1)).collect()
    val b = Training.trainQualityClassifierDf(spark, docs.repartition(7)).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("distilledScores: verdicts self-consistent, scores in [0,1], high agreement") {
    val rows = Training.distilledScoresDf(docs).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (score, mk, rk, ag) = (r.getDouble(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(score >= 0.0 && score <= 1.0)
      assert(ag == (if (mk == rk) 1 else 0), s"agree column inconsistent: $r")
    }
    val rate = rows.map(_.getInt(4)).sum.toDouble / rows.length
    assert(rate > 0.9, s"distilled agreement only $rate")
  }

  test("degenerate corpora: identical texts and a single doc train without NaN") {
    import spark.implicits._
    // all-identical docs: every feature has zero variance → the std
    // guard must hold every standardized column at 0; only the bias can
    // move and the model predicts the (unanimous) label perfectly
    val same = Seq.tabulate(3)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val r1 = Training.trainQualityClassifierDf(spark, same).collect()
    for (r <- r1; j <- 3 to 7)
      assert(!r.getDouble(j).isNaN && !r.getDouble(j).isInfinite)
    for (r <- r1; j <- 4 to 7)
      assert(r.getDouble(j) == 0.0, s"zero-variance feature weight moved: $r")
    assert(r1.last.getLong(1) == 3L, "unanimous label not learned")
    // a single-document corpus must also survive (n = 1 denominators)
    val one = Seq((0L, "just one document here")).toDF("doc_id", "text")
    val r2 = Training.trainQualityClassifierDf(spark, one).collect()
    assert(r2.length == 4)
    for (r <- r2; j <- 3 to 7)
      assert(!r.getDouble(j).isNaN && !r.getDouble(j).isInfinite)
  }

  test("qualityModelSink: train-offline/serve-online parity with the batch scorer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val arrivals = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.take(60)
    val input = MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("qm_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("qm_ckpt").toString
    val query = Training.qualityModelSink(
      input.toDF().toDF("doc_id", "text"), docs, out, ckpt,
      triggerMs = 50L).start()
    try {
      input.addData(arrivals.take(25): _*); query.processAllAvailable()
      input.addData(arrivals.drop(25): _*); query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.read.parquet(out).drop("batch_id")
      .collect().map(_.toSeq).toSet
    val model = Training.fitModel(docs)
    val batch = Training.scoreWith(
        docs.filter(col("doc_id").isin(arrivals.map(_._1): _*)), model)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"streamed ${streamed.size} != batch ${batch.size}")
    // the model actually trained: scores vary across documents
    assert(streamed.map(_(1)).toSet.size > 1,
      s"all streamed scores identical: ${streamed.map(_(1)).toSet}")
  }

  test("the trained model reproduces the rule verdict it distilled") {
    // score the corpus with the FINAL weights (re-deriving the same
    // standardized features) and compare against the rule labels: the
    // distilled model must agree on > 90% of documents — and that
    // agreement must equal the reported epoch-4 n_correct only if the
    // final pass uses the PRE-update weights; here we check agreement
    // independently rather than trusting the ledger column
    val last = result.last
    val w = (3 to 7).map(last.getDouble).toArray // rounded is fine for a 0.9 bar
    val t = TextAnalysis.tokens(col("text"))
    val nTok = size(t).cast("double")
    val sr = TextAnalysis.stopwordCount(col("text")).cast("double") / nTok
    val pr = TextAnalysis.punctCount(col("text")).cast("double") / length(col("text"))
    val lt = log(nTok + lit(1.0))
    val al = length(col("text")).cast("double") / nTok
    val y = when(TextAnalysis.qualityScoreCol >= lit(0.5), lit(1.0)).otherwise(lit(0.0))
    val f = docs.filter(length(col("text")) > 0)
      .select(sr.as("sr"), pr.as("pr"), lt.as("lt"), al.as("al"), y.as("y"))
    val stats = f.agg(avg("sr"), stddev_pop("sr"), avg("pr"), stddev_pop("pr"),
      avg("lt"), stddev_pop("lt"), avg("al"), stddev_pop("al")).head()
    def z(i: Int) = {
      val m = stats.getDouble(2 * i); val s0 = stats.getDouble(2 * i + 1)
      val s = if (s0 > 0) s0 else 1.0
      (col(Seq("sr", "pr", "lt", "al")(i)) - lit(m)) / lit(s)
    }
    val score = lit(w(0)) + lit(w(1)) * z(0) + lit(w(2)) * z(1) +
      lit(w(3)) * z(2) + lit(w(4)) * z(3)
    val agree = f.select(
      when((score >= lit(0.0)) === (col("y") === lit(1.0)), 1L).otherwise(0L).as("ok"))
      .agg(sum("ok"), count(lit(1))).head()
    val rate = agree.getLong(0).toDouble / agree.getLong(1)
    assert(rate > 0.9, s"distilled model agrees on only $rate")
  }
}

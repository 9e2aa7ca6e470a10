package graft.tools

/** One-off comparison of decontamination's two execution paths at a
  * given sf dir: broadcast (two scans, no train shuffle) vs the fused
  * one-pass fallback (one scan, one corpus-wide shuffle).
  */
object DecontamBench {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.LocalSession.build()
    graft.BenchKit.warmUp(spark, d)
    def time(maxB: Long): Double = {
      def once: Double = {
        System.gc()
        val t0 = System.nanoTime()
        graft.ext.Corpus.decontaminationStatsDf(
          graft.Tables.documents(spark, d), maxBroadcastEvalBytes = maxB)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }
    println(f"broadcast path: ${time(256L << 20)}%.3f s")
    println(f"one-pass  path: ${time(0L)}%.3f s")
    println(f"bloom     path: ${graft.BenchKit.bestDf(() =>
      graft.ext.Corpus.decontaminationStatsBloom(spark, d))}%.3f s")
    spark.stop()
  }
}

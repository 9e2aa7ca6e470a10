package graft.tools

/** Broadcast-disabled (at-scale regime) audit: every self-join operator
  * should end in canonically identical exchanges that AQE materializes
  * once. A "false" here means the kernel/scan below the join runs twice.
  */
object ReuseAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val d = "/root/testdata/sf0.01"
    Seq("q_minhash_pairs", "q_simhash_near_dups", "q_semantic_dedup",
      "q_embedding_near_dups", "q_ngram_jaccard", "q_source_overlap").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"$q reused=${p.contains("ReusedExchange")}")
    }
    spark.stop()
  }
}

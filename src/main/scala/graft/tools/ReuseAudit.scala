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
      "q_embedding_near_dups", "q_ngram_jaccard", "q_source_overlap",
      // LM family: the count branch and the scoring probe share the
      // corpus scan/explode subtree — reuse means it runs once.
      // Known-false: q_bigram_logprob (column pruning reads doc_id+text
      // on the probe and text-only under the count, so the subtrees are
      // canonically different — the second scan is the documented
      // honest cost of count-based LMs, see backoffLogProb's scaladoc);
      // q_embedding_near_dups (bounded id-range kernel, false by
      // construction since r7 — accepted)
      "q_bigram_logprob", "q_backoff_logprob", "q_entropy_rate",
      // sketch overlap: the per-source sketch aggregate feeds both pair
      // sides — reuse means the corpus folds into sketches ONCE
      "q_sketch_overlap").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"$q reused=${p.contains("ReusedExchange")}")
    }
    spark.stop()
  }
}

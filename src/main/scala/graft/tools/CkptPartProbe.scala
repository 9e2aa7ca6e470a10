package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: does localCheckpoint preserve an explicit
  * pre-checkpoint hash partitioning, and does a downstream join on the
  * same key (possibly through an alias) skip the exchange on the
  * checkpointed side? Prints the joined plan — look for
  * `Exchange hashpartitioning(src` on the checkpoint side.
  */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build()
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val edges = org.apache.spark.sql.GraftSql.localCheckpointKeyedBy(
      (1L to 100000L).map(i => (i % 997, i % 1013)).toDF("src", "dst"),
      Seq("src"))
    println("edges ckpt partitioning: " +
      edges.queryExecution.executedPlan.outputPartitioning)
    val state = (0L until 997L).map(i => (i, i * 7)).toDF("doc_id", "rank")
    val joined = state.select(col("doc_id").as("src"), col("rank"))
      .join(edges, Seq("src"))
      .groupBy(col("dst")).agg(sum(col("rank")).as("inflow"))
    joined.write.format("noop").mode("overwrite").save()
    println(joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    // aliased-state side: repartition state on doc_id, checkpoint, then
    // rename to src — does AliasAwareOutputPartitioning carry it?
    val state2 = org.apache.spark.sql.GraftSql.localCheckpointKeyedBy(
      state, Seq("doc_id"))
    println("state2 ckpt partitioning: " +
      state2.queryExecution.executedPlan.outputPartitioning)
    // force a sort-merge join so co-partitioning (not broadcast) decides
    val j2 = state2.select(col("doc_id").as("src"), col("rank"))
      .hint("merge")
      .join(edges.hint("merge"), Seq("src"))
    j2.write.format("noop").mode("overwrite").save()
    println(j2.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}

package graft.tools

/** Final-adaptive-plan exchange census for named SparkEntry queries —
  * the measurement behind PlanShapeSpec's exchange-count pins. Runs
  * each query to completion (AQE finalizes the plan only at runtime),
  * then counts keyed shuffles the way the pins do: Exchange lines that
  * are not broadcasts, reuses, or round-robin fanOut repartitions.
  * Usage: runMain graft.tools.PlanCount <sfDir> <query...> [--plan]
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val showPlan = args.contains("--plan")
    val spark = graft.LocalSession.build()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val cnt = p.linesIterator.count(l => l.contains("Exchange")
        && !l.contains("BroadcastExchange") && !l.contains("Reused")
        && !l.contains("RoundRobinPartitioning"))
      println(s"EXCHANGES $n = $cnt")
      if (showPlan) println(p)
    }
    spark.stop()
  }
}

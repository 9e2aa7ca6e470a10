package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch profiler: time named SparkEntry queries and print plans.
  * Usage: runMain graft.tools.Probe <sfDir> <query...> [--plan]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val showPlan = args.contains("--plan")
    val spark = graft.LocalSession.build()
    graft.SparkEntry.queries("q_domain_stats")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warm-up
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (showPlan) println(s"==== PLAN $n ====\n" + df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"==== TIME $n min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

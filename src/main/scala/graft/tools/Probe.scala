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
      if (showPlan) {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        println(s"==== PLAN $n ====\n" + df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      // rebuild the query each run (BenchKit.runOnce) — queries that do
      // eager work at build time (the CC loop) must bill it to the run
      val times = (1 to 3).map { _ =>
        System.gc()
        graft.BenchKit.runOnce(spark, n, sfDir)
      }
      println(f"==== TIME $n min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for arbitrary SQL over the fixture tables: register
  * every table as a temp view, time the statement with the bench
  * methodology (noop write, fresh plan per run, GC outside the window).
  * Usage: runMain graft.tools.ProbeSql <sfDir> <sql>
  */
object ProbeSql {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sql = args(1)
    val spark = graft.LocalSession.build()
    tables.foreach(t =>
      graft.Tables.table(spark, sfDir, t).createOrReplaceTempView(t))
    spark.sql("SELECT count(*) FROM lineitem").collect() // warm-up
    val times = (1 to 3).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"==== TIME min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}

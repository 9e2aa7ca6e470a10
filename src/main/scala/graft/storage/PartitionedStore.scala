package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned event storage: the layout that makes time-range
  * queries at 100 TB read only the touched days (partition pruning at
  * the file-listing level — verified by plan assertion in tests, not
  * just assumed). Writers repartition by the partition column first so
  * each day is written by one task set instead of every task emitting a
  * sliver of every day.
  */
object PartitionedStore {

  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** A day-bounded read — the partition filter must prune at listing
    * time (PartitionFilters in the scan, not a post-scan Filter).
    */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("event_date") === lit(day))
}

package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located joins: both fact tables written
  * bucketed+sorted on the join key means the join is planned WITHOUT a
  * shuffle on either side — at 100 TB this turns the recurring
  * fact-fact join (e.g. lineitem ⋈ orders on orderkey, run by every
  * revenue query) from the dominant network cost into a local merge per
  * bucket. Write once, join many.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both sides are
    * bucketed with the same bucket count on the join key, the physical
    * plan contains no Exchange (verified by BucketingSpec).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}

package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File sinks (SURVEY.md §2.2 K3–K5): structured JSON outputs replacing
  * the reference's driver-side `json.dump` loops, and the per-document
  * text sink. All paths are scheme-agnostic (local/HDFS/S3A — K6).
  */
object FileSinks {

  /** K3: batch-stats records (nested map columns) as a JSON file.
    * Reference `export_stats.py:69-73` dumped a pretty-printed array from
    * the driver; here the stats frame writes as JSON-lines, the scalable
    * shape (each executor writes its partition, no driver collect).
    */
  def writeStatsJson(stats: DataFrame, path: String): Unit =
    stats.coalesce(1).write.mode("overwrite").json(path)

  /** K4: links JSON sink (reference `crawl/crawl.py:137-142`). */
  def writeLinksJson(links: DataFrame, path: String): Unit =
    links.select(col("name"), col("link"))
      .coalesce(1).write.mode("overwrite").json(path)

  /** K5: per-document text sink (reference `crawl/crawl.py:144-154` wrote
    * `doc{i}.txt` per document). Partitioned by domain, one line per doc:
    * at corpus scale this is a parallel write of text parts per domain
    * rather than a million tiny driver-written files.
    */
  def writeDocsText(docs: DataFrame, path: String): Unit =
    docs.select(col("domain"), col("content").as("value"))
      .write.mode("overwrite").partitionBy("domain").text(path)
}

package graft.ingest

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Producer-side corpus loading (SURVEY.md §2.1 S2, §2.3 P7, §2.6 A7):
  * whole-file directory scan with filename-derived metadata — the engine
  * form of the reference's `Path.iterdir()` + `glob("*.txt")` loop
  * (`kafka/push_data_to_kafka.py:56-69`).
  *
  * Scale note: `wholetext` makes one row per file and one partition per
  * file by default, which is exactly right for a corpus of many small
  * documents fanned out across executors; the path-derived columns are
  * codegen'd expressions on `input_file_name()`, not a driver-side walk.
  */
object CorpusSource {

  /** S2 + P7: read every `*.txt` under `dir/<domain>/`, one row per file,
    * with domain/filename extracted from the path — the reference's
    * document-record shape (`push_data_to_kafka.py:25-30`).
    */
  def wholeTextCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(s"$dir/*/*.txt")
      .select(input_file_name().as("file_path"), col("value").as("content"))
      .filter(col("file_path").endsWith(".txt")) // P7 suffix predicate
      .select(
        regexp_extract(col("file_path"), "([^/]+)/[^/]+$", 1).as("domain"),
        regexp_extract(col("file_path"), "([^/]+)$", 1).as("filename"),
        col("content"),
        col("file_path"))

  /** A7: the reference's producer counters
    * (`push_data_to_kafka.py:51-53,100-105`) as `observe()` metrics — a
    * zero-cost side-channel on the ingest plan instead of driver-side
    * tallies. Read the totals from the Observation after an action.
    */
  def withIngestCounters(df: DataFrame, obs: Observation): DataFrame =
    df.observe(obs,
      count(lit(1)).as("total_files"),
      count(col("content")).as("success_count"),
      sum(when(col("content").isNull, 1L).otherwise(0L)).as("error_count"),
      sum(length(col("content"))).as("total_chars"))
}

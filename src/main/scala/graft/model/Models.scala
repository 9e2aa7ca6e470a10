package graft.model

import org.apache.spark.sql.types._

/** Case classes + schemas for the reference's record types (SURVEY.md §1).
  *
  * Document record: reference `kafka/push_data_to_kafka.py:25-30` and
  * `spark/consumer.py:10-15` (all fields nullable).
  */
final case class LegalDocument(
    domain: String,
    filename: String,
    content: String,
    file_path: String
)

/** Extracted metadata record: reference `crawl/1/extract_document_info.py:54-61`. */
final case class DocMetadata(
    file: String,
    main_code: Option[String],
    related_codes: Seq[String],
    agency: Option[String],
    issue_date: Option[String],
    signer: Option[String]
)

/** Per-micro-batch stats record: reference `spark/export_stats.py:36-42`.
  * `domains` / `size_stats` are string→long maps in the reference's JSON.
  */
final case class BatchStats(
    batch_id: Long,
    timestamp: java.sql.Timestamp,
    total_documents: Long,
    domains: Map[String, Long],
    size_stats: Map[String, Long]
)

/** Crawler link record: reference `crawl/crawl.py:82`. */
final case class DocLink(name: String, link: String)

object Schemas {
  /** Explicit document schema — the reference declares this by hand
    * (`spark/consumer.py:10-15`) rather than using JSON inference.
    */
  val document: StructType = StructType(Seq(
    StructField("domain", StringType, nullable = true),
    StructField("filename", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("file_path", StringType, nullable = true)
  ))

  /** events.props JSON payload (TESTDATA `events` table). */
  val eventProps: StructType = StructType(Seq(
    StructField("k", LongType, nullable = true)
  ))
}

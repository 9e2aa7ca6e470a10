package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text / regex extraction operators (SURVEY.md §2.8, T3–T9), built from
  * Catalyst built-in expressions so they stay inside whole-stage codegen
  * and are pushdown/pruning-friendly ([[nfcNormalize]] included — a
  * native codegen'd expression since r16; it was the one UDF exception).
  *
  * Semantics mirror the reference's pure-Python extractors
  * (`crawl/1/extract_document_info.py`), applied to any string column.
  */
object TextExtract {

  /** Vietnamese legal document-code pattern.
    * Reference: `crawl/1/extract_document_info.py:5`.
    * `Đ` is U+0110 — a plain literal in Java regex, same as Python.
    */
  val codePattern = "\\d{1,4}/(?:\\d{4}/)?[A-ZĐ]{1,5}(?:-[A-Z0-9]{1,5})*"

  /** All document codes in a text (T3). */
  def docCodes(c: Column): Column = regexp_extract_all(c, lit(codePattern), lit(0))

  /** First code = main_code (T3). Null when no match. */
  def mainCode(c: Column): Column = {
    val codes = docCodes(c)
    when(size(codes) > 0, try_element_at(codes, lit(1)))
  }

  /** Later codes that differ from main_code, order-preserving (T3).
    * Reference: `extract_document_info.py:20`.
    */
  def relatedCodes(c: Column): Column = {
    val codes = docCodes(c)
    when(size(codes) > 0,
      filter(slice(codes, 2, 1000000), x => x =!= try_element_at(codes, lit(1)))
    ).otherwise(array().cast("array<string>"))
  }

  /** Agency: `content.split("|")[1].strip()` when a pipe exists (T4).
    * Reference: `extract_document_info.py:23-25`.
    */
  def agency(c: Column): Column =
    when(c.contains("|"), trim(try_element_at(split(c, "\\|"), lit(2))))

  /** Issue date (T5): first line containing both "Số:" and "ngày" → the
    * pipe-separated part containing "ngày"; fallback: first line matching
    * `ngày\s+\d{1,2}\s+tháng`. Reference: `extract_document_info.py:27-43`.
    */
  def issueDate(c: Column): Column = {
    val lines = split(c, "\n")
    val candidate = try_element_at(
      filter(lines, l => l.contains("Số:") && l.contains("ngày")), lit(1))
    val fromCandidate = try_element_at(
      filter(split(candidate, "\\|"), p => p.contains("ngày")), lit(1))
    val fallback = try_element_at(
      filter(lines, l => l.rlike("ngày\\s+\\d{1,2}\\s+tháng")), lit(1))
    when(candidate.isNotNull, trim(fromCandidate)).otherwise(trim(fallback))
  }

  /** Signer (T6): last line matching the signer-keyword pattern, kept whole.
    * Reference: `extract_document_info.py:46-52` (both branches of the
    * conditional at :51 are identical — the whole stripped line).
    */
  def signer(c: Column): Column = {
    val pat = "\\b(KT\\.|TL\\.|THỨ TRƯỞNG|BỘ TRƯỞNG)\\b"
    trim(try_element_at(filter(reverse(split(c, "\n")), l => l.rlike(pat)), lit(1)))
  }

  /** Whitespace normalize (T7): `' '.join(text.split())`.
    * Reference: `crawl/crawl.py:198-199`. Collapse FIRST, then trim —
    * Spark's trim strips only spaces, so leading tabs/newlines would
    * otherwise survive as a leading space.
    */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Dash-run removal (T8). Reference: `crawl/crawl.py:226`. */
  def stripDashRuns(c: Column): Column = regexp_replace(c, "-{2,}", "")

  /** Unicode NFC normalization: crawled Vietnamese text arrives in a mix
    * of composed (U+1EBF) and decomposed (e + U+0302 + U+0301) forms;
    * every downstream equality — dedup hashes, regex literals, join
    * keys — silently misses across the two unless ingest canonicalizes.
    * Since r16 a native codegen'd expression
    * ([[graft.functions.NfcNormalizeExpr]]) rather than a UDF: same
    * platform Normalizer and null semantics, but the already-normalized
    * fast path is allocation-free and the content-hash projection stays
    * in one whole-stage-codegen span.
    */
  def nfcNormalize(c: Column): Column = graft.functions.NfcNormalizeExpr.nfc(c)

  /** Vietnamese date string → DateType: `ngày D tháng M năm Y` → make_date.
    * Natural extension (SURVEY §2.8 note): the reference keeps these raw.
    */
  def parseVnDate(c: Column): Column = {
    val p = "ngày\\s+(\\d{1,2})\\s+tháng\\s+(\\d{1,2})\\s+năm\\s+(\\d{4})"
    val dd = regexp_extract(c, p, 1)
    val mm = regexp_extract(c, p, 2)
    val yy = regexp_extract(c, p, 3)
    when(dd =!= "", make_date(yy.cast("int"), mm.cast("int"), dd.cast("int")))
  }

  /** The full metadata-extraction query (reference §3.3 as one DataFrame op):
    * five expression trees over the corpus in a single scan.
    * `related_codes` is emitted `;`-joined (comparison-stable scalar: the
    * driver's pandas row-compare cannot sort array cells).
    */
  def extractDocMetadata(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(
        col("doc_id"),
        mainCode(col("text")).as("main_code"),
        array_join(relatedCodes(col("text")), ";").as("related_codes"),
        agency(col("text")).as("agency"),
        issueDate(col("text")).as("issue_date"),
        signer(col("text")).as("signer")
      )
      .orderBy(col("doc_id"))

  /** T7 normalize + first-token extraction as an oracle-checkable query. */
  def normalizedPreview(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(
        col("doc_id"),
        substring(normalizeWhitespace(col("text")), 1, 60).as("norm_prefix"),
        regexp_extract(col("text"), "^(\\w+)", 1).as("first_token")
      )
      .orderBy(col("doc_id"))
}

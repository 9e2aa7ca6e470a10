package graft.extract

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** T3–T8 + parse_vn_date semantics (reference
  * `crawl/1/extract_document_info.py:5-52` behaviors), exercised through
  * real Spark plans over Vietnamese legal-document-shaped fixtures.
  */
class TextExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def extractAll(text: String) =
    Seq(text).toDF("text").select(
      TextExtract.mainCode($"text").as("main_code"),
      TextExtract.relatedCodes($"text").as("related_codes"),
      TextExtract.agency($"text").as("agency"),
      TextExtract.issueDate($"text").as("issue_date"),
      TextExtract.signer($"text").as("signer")
    ).collect().head

  private val fullDoc =
    """BỘ TÀI CHÍNH | CỘNG HÒA XÃ HỘI CHỦ NGHĨA VIỆT NAM
      |Số: 2017/QĐ-BTC | Hà Nội, ngày 04 tháng 10 năm 2022
      |Căn cứ Nghị định số 87/2017/NĐ-CP của Chính phủ;
      |Căn cứ Quyết định số 2530/QĐ-BTC ngày 29/12/2021;
      |Điều 1. Điều chỉnh dự toán.
      |KT. BỘ TRƯỞNG
      |THỨ TRƯỞNG""".stripMargin

  test("T3: main_code is the first code match") {
    assert(extractAll(fullDoc).getString(0) == "2017/QĐ-BTC")
  }

  test("T3: related_codes keeps later distinct codes in order, never main_code") {
    val related = extractAll(fullDoc).getSeq[String](1)
    assert(related == Seq("87/2017/NĐ-CP", "2530/QĐ-BTC"))
    assert(!related.contains("2017/QĐ-BTC"))
  }

  test("T3: repeated main code is dropped from related_codes") {
    val r = extractAll("Số: 11/QĐ-A rồi 22/TT-B rồi lại 11/QĐ-A xong 33/NĐ-C")
    assert(r.getString(0) == "11/QĐ-A")
    assert(r.getSeq[String](1) == Seq("22/TT-B", "33/NĐ-C"))
  }

  test("T3: no codes → null main, empty related") {
    val r = extractAll("Văn bản không có mã số nào cả")
    assert(r.isNullAt(0))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("T4: agency is the trimmed second pipe-part; null when no pipe") {
    assert(extractAll(fullDoc).getString(2) == "CỘNG HÒA XÃ HỘI CHỦ NGHĨA VIỆT NAM\nSố: 2017/QĐ-BTC")
    assert(extractAll("không có dấu gạch đứng").isNullAt(2))
  }

  test("T5: issue date from the Số:+ngày line, pipe-part containing ngày") {
    assert(extractAll(fullDoc).getString(3) == "Hà Nội, ngày 04 tháng 10 năm 2022")
  }

  test("T5: fallback to first line matching the ngày/tháng pattern") {
    val doc = "Tiêu đề văn bản\nBan hành ngày 7 tháng 12 năm 2021 tại Huế\nNội dung."
    assert(extractAll(doc).getString(3) == "Ban hành ngày 7 tháng 12 năm 2021 tại Huế")
  }

  test("T5: null when neither form matches") {
    assert(extractAll("không ngày tháng gì").isNullAt(3))
  }

  test("T6: signer is the LAST keyword line, scanned from the end, kept whole") {
    assert(extractAll(fullDoc).getString(4) == "THỨ TRƯỞNG")
    val doc = "mở đầu\nKT. BỘ TRƯỞNG\ngiữa chừng\nTL. BỘ TRƯỞNG Nguyễn Văn A\ncuối."
    assert(extractAll(doc).getString(4) == "TL. BỘ TRƯỞNG Nguyễn Văn A")
  }

  test("T7/T8: whitespace normalize and dash-run removal") {
    val r = Seq("  a\t\tb \n c  ", "a --- b -- c - d").toDF("text").select(
      TextExtract.normalizeWhitespace($"text").as("n"),
      TextExtract.stripDashRuns($"text").as("d")).collect()
    assert(r(0).getString(0) == "a b c")
    assert(r(1).getString(1) == "a  b  c - d")
  }

  test("parse_vn_date: D tháng M năm Y → DateType; null when absent") {
    val r = Seq("Hà Nội, ngày 04 tháng 10 năm 2022", "ngày 7 tháng 1 năm 1999", "no date")
      .toDF("text").select(TextExtract.parseVnDate($"text").as("d")).collect()
    assert(r(0).getDate(0).toString == "2022-10-04")
    assert(r(1).getDate(0).toString == "1999-01-07")
    assert(r(2).isNullAt(0))
  }

  test("NFC normalization unifies composed and decomposed Vietnamese forms") {
    val composed = "Quy\u1EBFt \u0111\u1ECBnh" // precomposed (NFC) form
    val decomposed = java.text.Normalizer.normalize(
      composed, java.text.Normalizer.Form.NFD) // base letters + combining marks
    assert(composed != decomposed, "fixture must start in different forms")
    val out = Seq(composed, decomposed).toDF("text")
      .select(TextExtract.nfcNormalize($"text").as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == out(1), "NFC must unify the forms")
    assert(out(0) == composed)
    // dedup hashing agrees after normalization, differs before
    val hashes = Seq(composed, decomposed).toDF("text")
      .select(md5(TextExtract.nfcNormalize($"text")).as("h"), md5($"text").as("raw"))
      .collect()
    assert(hashes(0).getString(0) == hashes(1).getString(0))
    assert(hashes(0).getString(1) != hashes(1).getString(1))
  }

  test("property: related_codes never contains main_code (generated corpus)") {
    val codes = Seq("1/QĐ-A", "22/TT-BCT", "333/2020/NĐ-CP", "4/QĐ-A", "55/BKHĐT")
    val rng = new scala.util.Random(42)
    val docs = (0 until 200).map { i =>
      val picks = (0 until rng.nextInt(6)).map(_ => codes(rng.nextInt(codes.length)))
      (i.toLong, picks.mkString("van ban so ", " va ", " het"))
    }
    val out = docs.toDF("doc_id", "text").select(
      TextExtract.mainCode($"text").as("m"),
      TextExtract.relatedCodes($"text").as("r")).collect()
    out.foreach { row =>
      if (!row.isNullAt(0)) assert(!row.getSeq[String](1).contains(row.getString(0)))
      else assert(row.getSeq[String](1).isEmpty)
    }
  }
}

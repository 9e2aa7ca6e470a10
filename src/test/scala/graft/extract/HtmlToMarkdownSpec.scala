package graft.extract

import java.nio.file.{Files, Paths}
import graft.SparkTestBase

/** T10 golden + unit tests. The golden pair is the reference's own
  * artifact: `crawl/1/tvpl_new/html/doc641.html` is the source of
  * `crawl/1/tvpl/test.md` (verified: identical code/date/signer fields).
  */
class HtmlToMarkdownSpec extends SparkTestBase {

  private val goldenHtml = Paths.get("/root/reference/crawl/1/tvpl_new/html/doc641.html")
  private val goldenMd = Paths.get("/root/reference/crawl/1/tvpl/test.md")

  test("golden: doc641.html converts byte-for-byte to test.md") {
    assume(Files.exists(goldenHtml) && Files.exists(goldenMd))
    val html = Files.readString(goldenHtml)
    val expected = Files.readString(goldenMd)
    assert(HtmlToMarkdown.convert(html) == expected)
  }

  test("headers h1-h3 map to #/##/### with whitespace normalization") {
    val md = HtmlToMarkdown.convert(
      "<h1>  Title   One </h1><h2>Sub\n\ttwo</h2><h3>Deep</h3>")
    assert(md == "# Title One\n\n## Sub two\n\n### Deep")
  }

  test("ul and ol items; only direct-child li") {
    val md = HtmlToMarkdown.convert(
      "<ul><li>alpha</li><li>beta</li></ul><ol><li>first</li><li>second</li></ol>")
    assert(md == "- alpha\n\n- beta\n\n1. first\n\n2. second")
  }

  test("table becomes a width-aligned grid; br collapses; dash runs stripped in cells") {
    val md = HtmlToMarkdown.convert(
      "<table><tr><td>a<br>-----</td><td>long cell</td></tr>" +
        "<tr><td>bb</td><td>c</td></tr></table>")
    assert(md ==
      "| a  | long cell |\n\n|----|-----------|\n\n| bb | c         |")
  }

  test("rows missing cells are padded to max column count") {
    val md = HtmlToMarkdown.convert(
      "<table><tr><td>x</td><td>y</td><td>z</td></tr><tr><td>only</td></tr></table>")
    val lines = md.split("\n\n")
    assert(lines.length == 3)
    // all grid lines equal width
    assert(lines.map(_.length).distinct.length == 1)
  }

  test("p inside a table cell emits twice (reference descendants-walk semantics)") {
    val md = HtmlToMarkdown.convert(
      "<table><tr><td><p>inner text</p></td></tr></table>")
    val parts = md.split("\n\n")
    assert(parts.count(_.contains("inner text")) == 2) // cell + standalone p
  }

  test("empty p and br produce no output lines") {
    val md = HtmlToMarkdown.convert("<p>  </p><br/><p>kept</p>")
    assert(md == "kept")
  }

  test("entities decode; nbsp is whitespace for normalization") {
    val md = HtmlToMarkdown.convert("<p>a&nbsp;&nbsp;b &amp; c &#65;</p>")
    assert(md == "a b & c A")
  }

  test("body container is preferred when present") {
    val md = HtmlToMarkdown.convert(
      "<html><head><title>ignored</title></head><body><p>seen</p></body></html>")
    assert(md == "seen")
  }

  test("mismatched closers and unknown tags don't break the walk") {
    val md = HtmlToMarkdown.convert("<div><p>one</i></p><custom><p>two</p></div>")
    assert(md == "one\n\ntwo")
  }

  test("robustness: never throws on random tag soup; grid invariant holds") {
    // crawl data is arbitrary — the operator must be total
    val rng = new scala.util.Random(7)
    val frags = Array("<p>", "</p>", "<h1>", "</h2>", "<table>", "<tr>", "<td>",
      "</table>", "<ul>", "<li>", "<br>", "text ", "Việt ", "&amp;", "&bogus;",
      "< ", ">", "<!-- c ", "-->", "<div x=\">\">", "</nope>", "&#65;", "\n")
    for (_ <- 0 until 300) {
      val soup = (0 until rng.nextInt(40)).map(_ => frags(rng.nextInt(frags.length))).mkString
      val md = HtmlToMarkdown.convert(soup) // must not throw
      assert(md != null)
      // no blank entries survive the filter (the reference drops them)
      assert(md.split("\n\n").forall(l => l.isEmpty == (md.isEmpty)))
    }
  }

  test("converts the full real crawled corpus (971 docs) without errors") {
    val dir = Paths.get("/root/reference/crawl/1/tvpl_new/html")
    assume(Files.isDirectory(dir))
    var n = 0
    var nonEmpty = 0
    var emptyWithContent = 0
    val stream = Files.list(dir)
    try {
      val files = stream.iterator()
      while (files.hasNext) {
        val f = files.next()
        if (f.toString.endsWith(".html")) {
          val html = Files.readString(f)
          val md = HtmlToMarkdown.convert(html) // must not throw
          assert(md != null, s"null output for $f")
          n += 1
          if (md.nonEmpty) nonEmpty += 1
          // empty output is only legitimate for placeholder pages with no
          // handled tags (the reference parser also emits nothing there)
          else if (html.contains("<p") || html.contains("<table") || html.contains("<h1"))
            emptyWithContent += 1
        }
      }
    } finally stream.close()
    assert(n >= 900, s"expected the full corpus, saw $n")
    assert(emptyWithContent == 0, "handled-tag documents must produce markdown")
    assert(nonEmpty >= n - 5, s"only placeholder pages may be empty ($nonEmpty/$n)")
  }

  test("null input stays null; UDF runs in a query") {
    assert(HtmlToMarkdown.convert(null) == null)
    import spark.implicits._
    val out = Seq("<h1>q</h1>").toDF("html")
      .select(HtmlToMarkdown.htmlToMarkdownCol($"html").as("md"))
      .collect().map(_.getString(0))
    assert(out.sameElements(Array("# q")))
  }
}

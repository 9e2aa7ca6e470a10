package graft.extract

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML → markdown structural parser (SURVEY.md §2.8 T10) — the one
  * genuinely non-relational operator in the reference
  * (`crawl/crawl.py:164-255`). Re-implemented from observed behavior:
  * walk every element in document order; h1-h3 → `#`-headers, p →
  * whitespace-normalized text, ul/ol → dash/numbered items, table →
  * width-aligned markdown grid (cell `<br>`s collapsed, dash runs
  * stripped); join non-empty outputs with blank lines. Nested handled
  * elements emit both inside their ancestor's text AND independently —
  * that is the reference's descendants-walk semantics, kept verbatim
  * (golden: `crawl/1/tvpl/test.md`).
  *
  * The HTML reader is a small lenient tokenizer (no external parser in
  * the sandbox): tags nest as written, mismatched closers pop to the
  * nearest matching opener or are ignored, void elements never nest,
  * script/style bodies are raw text, character references are decoded.
  */
object HtmlToMarkdown {

  // ------------------------------------------------------------- DOM
  sealed private trait Node
  final private case class Elem(name: String, children: ArrayBuffer[Node]) extends Node
  final private case class Text(s: String) extends Node

  private val voidTags = Set(
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr", "param", "basefont", "frame", "keygen")
  private val rawTextTags = Set("script", "style")

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "bull" -> "•", "middot" -> "·",
    "times" -> "×", "divide" -> "÷", "deg" -> "°",
    "plusmn" -> "±", "frac12" -> "½", "sect" -> "§",
    "para" -> "¶", "laquo" -> "«", "raquo" -> "»")

  private def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(body.drop(1).toInt)))
              catch { case _: Exception => None }
            else namedEntities.get(body)
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None    => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  // --------------------------------------------------------- tokenizer
  private def parseHtml(html: String): Elem = {
    val root = Elem("[document]", ArrayBuffer.empty)
    val stack = ArrayBuffer[Elem](root)
    def top = stack.last
    var i = 0
    val n = html.length
    val text = new StringBuilder

    def flushText(): Unit = {
      if (text.nonEmpty) {
        top.children += Text(decodeEntities(text.toString)); text.clear()
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '/') {
          flushText()
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val name = html.substring(i + 2, end).trim.toLowerCase(java.util.Locale.ROOT)
            // pop to nearest matching opener; ignore unmatched closers
            val idx = stack.lastIndexWhere(_.name == name)
            if (idx > 0) stack.remove(idx, stack.length - idx)
            i = end + 1
          }
        } else if (c1.isLetter) {
          flushText()
          // scan for '>' honoring quoted attribute values
          var j = i + 1
          var quote: Char = 0
          var end = -1
          while (j < n && end < 0) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            else if (cj == '>') end = j
            j += 1
          }
          if (end < 0) { i = n }
          else {
            val inner = html.substring(i + 1, end)
            val selfClosing = inner.endsWith("/")
            val nameEnd = inner.indexWhere(ch => !ch.isLetterOrDigit)
            val name = (if (nameEnd < 0) inner else inner.substring(0, nameEnd))
              .toLowerCase(java.util.Locale.ROOT)
            val el = Elem(name, ArrayBuffer.empty)
            top.children += el
            if (rawTextTags.contains(name) && !selfClosing) {
              // raw-text body: everything until the matching close tag —
              // a case-insensitive regionMatches scan: no O(n) lowercase
              // copy per raw-text tag, and no locale-dependent case
              // mapping (default-locale toLowerCase under tr-TR changes
              // dotted-I lengths and would misalign indices)
              val needle = s"</$name"
              var close = -1
              var p = end + 1
              while (close < 0 && p <= n - needle.length) {
                if (html.regionMatches(true, p, needle, 0, needle.length)) close = p
                p += 1
              }
              val bodyEnd = if (close < 0) n else close
              if (bodyEnd > end + 1)
                el.children += Text(html.substring(end + 1, bodyEnd))
              val closeGt = html.indexOf('>', bodyEnd)
              i = if (closeGt < 0) n else closeGt + 1
            } else {
              if (!selfClosing && !voidTags.contains(name)) stack += el
              i = end + 1
            }
          }
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    root
  }

  // ------------------------------------------------ reference semantics

  /** Python str.isspace() character set (Java's isWhitespace misses
    * NBSP/NEL/figure-space, which the reference's str.split() treats as
    * whitespace).
    */
  private def isPySpace(c: Char): Boolean = c match {
    case '\t' | '\n' | '\u000B' | '\f' | '\r' | ' ' => true
    case _ if c >= '\u001C' && c <= '\u001F'            => true
    case '\u0085' | '\u00A0' | '\u1680'                => true
    case _ if c >= '\u2000' && c <= '\u200A'            => true
    case '\u2028' | '\u2029' | '\u202F' | '\u205F' | '\u3000' => true
    case _ => false
  }

  /** `' '.join(text.split())` */
  private def cleanText(s: String): String = {
    val out = new StringBuilder(s.length)
    var inWord = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isPySpace(c)) { if (inWord) { out.append(' '); inWord = false } }
      else { out.append(c); inWord = true }
      i += 1
    }
    if (out.nonEmpty && out.last == ' ') out.setLength(out.length - 1)
    out.toString
  }

  private def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** All descendant text, concatenated with no separator (get_text()). */
  private def getText(e: Elem): String = {
    val sb = new StringBuilder
    def walk(x: Node): Unit = x match {
      case Text(s)     => sb.append(s)
      case el: Elem    => el.children.foreach(walk)
    }
    e.children.foreach(walk)
    sb.toString
  }

  /** Descendant text with `<br>` as '\n', then stripped. */
  private def textWithBr(e: Elem): String = {
    val sb = new StringBuilder
    def walk(x: Node): Unit = x match {
      case Text(s)              => sb.append(s)
      case el: Elem if el.name == "br" => sb.append('\n'); el.children.foreach(walk)
      case el: Elem             => el.children.foreach(walk)
    }
    e.children.foreach(walk)
    pyStrip(sb.toString)
  }

  private def descendants(e: Elem): Iterator[Elem] =
    e.children.iterator.flatMap {
      case el: Elem => Iterator.single(el) ++ descendants(el)
      case _        => Iterator.empty
    }

  private def directChildren(e: Elem, name: String): Seq[Elem] =
    e.children.collect { case el: Elem if el.name == name => el }.toSeq

  private def formatTable(tableEl: Elem): Seq[String] = {
    val rows = ArrayBuffer[ArrayBuffer[String]]()
    for (tr <- descendants(tableEl).filter(_.name == "tr")) {
      val row = ArrayBuffer[String]()
      for (cell <- descendants(tr).filter(e => e.name == "th" || e.name == "td")) {
        val raw = textWithBr(cell)
        val collapsed = raw.split('\n').iterator.map(pyStrip).filter(_.nonEmpty).mkString(" ")
        row += collapsed.replaceAll("-{2,}", "")
      }
      if (row.nonEmpty) rows += row
    }
    if (rows.isEmpty || rows.head.isEmpty) return Seq.empty
    val maxCols = rows.map(_.length).max
    rows.foreach(r => while (r.length < maxCols) r += "")
    val widths = (0 until maxCols).map(i => rows.map(_(i).length).max)
    def fmtRow(r: Seq[String]) =
      "| " + r.zipWithIndex.map { case (cell, i) => cell.padTo(widths(i), ' ') }.mkString(" | ") + " |"
    val header = fmtRow(rows.head.toSeq)
    val sep = "|-" + widths.map("-" * _).mkString("-|-") + "-|"
    Seq(header, sep) ++ rows.tail.map(r => fmtRow(r.toSeq))
  }

  /** The operator: HTML text → markdown. Null-safe. */
  def convert(html: String): String = {
    if (html == null) return null
    val doc = parseHtml(html)
    val container = descendants(doc).find(_.name == "body").getOrElse(doc)
    val out = ArrayBuffer[String]()
    for (el <- descendants(container)) el.name match {
      case "h1"    => out += s"# ${cleanText(getText(el))}"
      case "h2"    => out += s"## ${cleanText(getText(el))}"
      case "h3"    => out += s"### ${cleanText(getText(el))}"
      case "p"     => out += cleanText(getText(el))
      case "ul"    => out ++= directChildren(el, "li").map(li => s"- ${cleanText(getText(li))}")
      case "ol"    => out ++= directChildren(el, "li").zipWithIndex.map {
                        case (li, i) => s"${i + 1}. ${cleanText(getText(li))}" }
      case "table" => out ++= formatTable(el)
      case _       => ()
    }
    out.filter(_.nonEmpty).mkString("\n\n")
  }

  /** Spark surface: registerable, codegen-opaque scalar UDF (justified:
    * genuinely non-relational structural parse; see SURVEY §7.3).
    */
  val htmlToMarkdown = udf(convert _)

  def htmlToMarkdownCol(c: Column): Column = htmlToMarkdown(c)
}

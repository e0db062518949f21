package graft.core

/** HTML -> text extraction, re-specified from the reference's two distinct
  * Jsoup call sites (jsoup is not available offline — SURVEY.md §7 H1):
  *
  *  - U1 index-time cleaner: `Jsoup.clean(html, Safelist.none())`
  *    (MorphologyServiceImpl.java:288-290) — strips ALL tags, keeps text
  *    nodes, re-escapes the base entities in the output.
  *  - U2 snippet-time: `Jsoup.parse(html).body().text()` (whitespace-
  *    normalized body text) and `Jsoup.parse(html).title()`
  *    (SearchServiceImpl.java:123-124, 180-186).
  *
  * Semantics are exact on the constrained generator grammar (FIXTURES.md §1:
  * no comments/CDATA/malformed nesting; entities limited to
  * `&amp; &lt; &gt; &quot;`). The corpus `text` column is produced BY
  * `cleanToText` at generation time, so the per-url byte-identity invariant
  * (BASELINE.json `input_hint`) holds by construction and is asserted
  * corpus-wide in tests.
  */
object HtmlText extends Serializable {

  private val TagRe = "<[^>]*>".r

  private def decodeEntities(s: String): String =
    s.replace("&amp;", "\u0000") // placeholder so &amp;lt; doesn't double-decode
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("\u0000", "&")

  private def encodeBaseEntities(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def collapseWs(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** U1 — index-time cleaner (`Jsoup.clean(html, Safelist.none())`):
    * tags removed (tag boundaries act as whitespace), entities decoded,
    * whitespace collapsed, base entities (& < >) re-escaped in the output
    * exactly as Jsoup's cleaner re-serializes text nodes. */
  def cleanToText(html: String): String = {
    if (html == null) return ""
    val noTags = TagRe.replaceAllIn(html, " ")
    encodeBaseEntities(collapseWs(decodeEntities(noTags)))
  }

  /** Binary-column variant (the corpus stores `html BINARY`, UTF-8). */
  def cleanToText(html: Array[Byte]): String =
    if (html == null) "" else cleanToText(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** Index-build hot path: single char-scan equivalent of [[cleanToText]]
    * (≈6x less garbage than the regex chain — the build is allocation-
    * bound at high thread counts). Semantics identical on the fixture
    * grammar; asserted corpus-wide by the EngineSpec invariant test (the
    * corpus `text` column is produced by the SPEC cleaner) plus
    * HtmlTextSpec equivalence cases. */
  def cleanToTextFast(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2)
    var i = 0
    var inTag = false
    var pendingSpace = false
    def emit(s: String): Unit = {
      if (pendingSpace && out.length > 0) out.append(' ')
      pendingSpace = false
      out.append(s)
    }
    def emitC(c: Char): Unit = {
      if (pendingSpace && out.length > 0) out.append(' ')
      pendingSpace = false
      out.append(c)
    }
    while (i < n) {
      val c = html.charAt(i)
      if (inTag) {
        if (c == '>') inTag = false
        i += 1
      } else if (c == '<') {
        inTag = true
        pendingSpace = true // tag boundary = whitespace in the spec path
        i += 1
      } else if (c == '&') {
        // decode the 4 grammar entities, then re-encode base entities:
        // &amp;/&lt;/&gt; round-trip verbatim; &quot; -> '"';
        // a bare '&' re-encodes to &amp;
        if (html.startsWith("&amp;", i)) { emit("&amp;"); i += 5 }
        else if (html.startsWith("&lt;", i)) { emit("&lt;"); i += 4 }
        else if (html.startsWith("&gt;", i)) { emit("&gt;"); i += 4 }
        else if (html.startsWith("&quot;", i)) { emitC('"'); i += 6 }
        else { emit("&amp;"); i += 1 }
      } else if (c == '>') { // bare '>' outside a tag re-encodes
        emit("&gt;")
        i += 1
      } else if (Character.isWhitespace(c)) {
        pendingSpace = true
        i += 1
      } else {
        emitC(c)
        i += 1
      }
    }
    out.toString
  }

  def cleanToTextFast(html: Array[Byte]): String =
    if (html == null) ""
    else cleanToTextFast(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** U2 — `Jsoup.parse(html).body().text()`: body-only, whitespace-
    * normalized, entities fully DECODED (Element.text() returns unescaped
    * text, unlike the cleaner). */
  def bodyText(html: String): String = {
    if (html == null) return ""
    val body = {
      val lo = html.toLowerCase
      val i = lo.indexOf("<body")
      val start = if (i >= 0) html.indexOf('>', i) + 1 else 0
      val j = lo.indexOf("</body>")
      val end = if (j >= 0) j else html.length
      if (start < end) html.substring(start, end) else ""
    }
    collapseWs(decodeEntities(TagRe.replaceAllIn(body, " ")))
  }

  def bodyText(html: Array[Byte]): String =
    if (html == null) "" else bodyText(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** U2 — `Jsoup.parse(html).title()`: first <title> element's decoded,
    * whitespace-trimmed text; "" when absent. */
  def title(html: String): String = {
    if (html == null) return ""
    val lo = html.toLowerCase
    val i = lo.indexOf("<title")
    if (i < 0) return ""
    val start = html.indexOf('>', i) + 1
    val j = lo.indexOf("</title>", start)
    if (start <= 0 || j < 0) return ""
    collapseWs(decodeEntities(html.substring(start, j)))
  }

  def title(html: Array[Byte]): String =
    if (html == null) "" else title(new String(html, java.nio.charset.StandardCharsets.UTF_8))
}

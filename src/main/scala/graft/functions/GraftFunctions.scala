package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

import graft.core.{HtmlText, Lemmatizer, Snippet}

/** The engine's scalar kernel surface (SURVEY.md §2.8/§2.9: U1–U5) as
  * Spark SQL functions — registered under `graft_*` so SQL users get the
  * same deterministic kernels the index build uses.
  *
  * All are marked deterministic (`udf(...)` defaults) and are plain Scala
  * UDFs per the SURVEY §7.3 decision table: profiling showed the hot path
  * is the index build's typed map (which calls the kernels directly,
  * no UDF boundary); the SQL-facing UDFs exist for ad-hoc queries where
  * codegen friction is irrelevant.
  */
object GraftFunctions {

  /** U1 — index-time cleaner (Jsoup.clean(Safelist.none()) semantics,
    * MorphologyServiceImpl.java:288-290). */
  val htmlToText = udf((html: Array[Byte]) => HtmlText.cleanToTextFast(html))

  /** U2 — body text (Jsoup.parse(html).body().text()). */
  val bodyText = udf((html: Array[Byte]) => HtmlText.bodyText(html))

  /** U2 — title (Jsoup.parse(html).title()). */
  val htmlTitle = udf((html: Array[Byte]) => HtmlText.title(html))

  /** U5 — normal form of one token (getNormalForms(w).get(0)). */
  val lemma = udf((token: String) => Lemmatizer.normalForm(token))

  /** U4+U5 — full analysis of a text: array of lemmas (particles dropped,
    * min length 3, Cyrillic-only tokenizer). */
  val lemmas = udf((text: String) => Lemmatizer.lemmas(text))

  /** U3 — highlighted snippet for a body text given query lemmas
    * (SearchServiceImpl.java:119-178, quirks preserved). */
  val snippet = udf((body: String, queryLemmas: Seq[String]) =>
    Snippet.build(body, queryLemmas.toSet))

  /** Particle check (МЕЖД/ПРЕДЛ/СОЮЗ; MorphologyServiceImpl.java:221-224). */
  val isParticle = udf((token: String) => Lemmatizer.isParticle(token))

  private val HrefRe = """(?i)<a\s[^>]*href\s*=\s*"([^"#]*)[^"]*"""".r

  /** S2 — link extraction (`document.select("a[href]")`,
    * HtmlParseService.java:109-121): href values, anchors stripped
    * (normalizeUrl drops `#...`, LinkToolsBox.java:89-116), order kept,
    * duplicates removed (LinkedHashSet semantics, LinkToolsBox.java:24-33). */
  val extractLinks = udf((html: Array[Byte]) => {
    if (html == null) Seq.empty[String]
    else {
      val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
      HrefRe.findAllMatchIn(s).map(_.group(1)).toSeq.distinct
    }
  })

  /** U6 — extractRootDomain (LinkToolsBox.java:43-60): scheme + host. */
  val rootUrl = udf((url: String) => {
    val i = url.indexOf("://")
    if (i < 0) url
    else {
      val j = url.indexOf('/', i + 3)
      if (j < 0) url else url.substring(0, j)
    }
  })

  /** U6 — getShortUrl (LinkToolsBox.java:120-135): site-relative path,
    * "/" for the root page. */
  val shortUrl = udf((url: String) => {
    val i = url.indexOf("://")
    val path =
      if (i < 0) url
      else {
        val j = url.indexOf('/', i + 3)
        if (j < 0) "" else url.substring(j)
      }
    if (path.isEmpty) "/" else path
  })

  /** Register all kernels for SQL use: graft_html_to_text, graft_body_text,
    * graft_title, graft_lemma, graft_lemmas, graft_snippet,
    * graft_is_particle. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_html_to_text", htmlToText)
    spark.udf.register("graft_body_text", bodyText)
    spark.udf.register("graft_title", htmlTitle)
    spark.udf.register("graft_lemma", lemma)
    spark.udf.register("graft_lemmas", lemmas)
    spark.udf.register("graft_snippet", snippet)
    spark.udf.register("graft_is_particle", isParticle)
    spark.udf.register("graft_extract_links", extractLinks)
    spark.udf.register("graft_root_url", rootUrl)
    spark.udf.register("graft_short_url", shortUrl)
  }
}

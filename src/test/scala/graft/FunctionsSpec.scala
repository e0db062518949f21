package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The graft_* SQL function surface (SURVEY.md §2.9) matches the kernels. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("registered SQL functions reproduce the core kernels") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    import spark.implicits._
    val html = "<html><head><title>Заголовок</title></head><body><p>слова <b>были</b> тут &amp; там</p></body></html>"
    Seq((html.getBytes("UTF-8"), "были слова под")).toDF("html", "q")
      .createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT graft_html_to_text(html) AS clean,
        |       graft_title(html) AS title,
        |       graft_body_text(html) AS body,
        |       graft_lemma('были') AS lem,
        |       graft_lemmas(q) AS lems,
        |       graft_is_particle('под') AS part,
        |       graft_snippet(graft_body_text(html), array('быть')) AS snip
        |FROM t""".stripMargin).collect()(0)
    assert(row.getAs[String]("clean") == "Заголовок слова были тут &amp; там")
    assert(row.getAs[String]("title") == "Заголовок")
    assert(row.getAs[String]("body") == "слова были тут & там")
    assert(row.getAs[String]("lem") == "быть")
    // "слова" is OOV in the closed dictionary → identity lemma (spec
    // extension, SURVEY.md §7 H2); "под" is ПРЕДЛ → dropped
    assert(row.getAs[scala.collection.Seq[String]]("lems").toSeq == Seq("быть", "слова"))
    assert(row.getAs[Boolean]("part"))
    assert(row.getAs[String]("snip").contains("<b>были</b>"))
  }

  test("link extraction (S2) and url utilities (U6)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val html = ("<html><body><a href=\"/p/1\">a</a> <b>x</b>" +
      "<a href=\"https://site0.test/p/2#frag\">b</a><a href=\"/p/1\">dup</a></body></html>")
      .getBytes("UTF-8")
    Seq((html, "https://site0.test/p/000042")).toDF("html", "url")
      .createOrReplaceTempView("t2")
    val r = spark.sql(
      """SELECT graft_extract_links(html) AS links,
        |       graft_root_url(url) AS root,
        |       graft_short_url(url) AS path,
        |       graft_short_url('https://site0.test') AS rootpath
        |FROM t2""".stripMargin).collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("links").toSeq ==
      Seq("/p/1", "https://site0.test/p/2")) // anchors stripped, dups dropped
    assert(r.getAs[String]("root") == "https://site0.test")
    assert(r.getAs[String]("path") == "/p/000042")
    assert(r.getAs[String]("rootpath") == "/")
  }
}

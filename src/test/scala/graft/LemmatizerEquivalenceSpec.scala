package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Lemmatizer
import graft.corpus.CorpusGen

/** The index-build hot path (lemmaCountsFast, single char-scan) must be
  * semantically identical to the transparent spec pipeline (lemmaCounts =
  * tokenize → particle drop → normalize → count) on everything the corpus
  * generator can emit, plus adversarial hand cases. */
class LemmatizerEquivalenceSpec extends AnyFunSuite {

  test("fast == spec on 400 generated pages (both langs, all noise classes)") {
    val cfg = CorpusGen.Config(nSites = 2, pagesPerSite = 200, seed = 7L)
    (0L until cfg.nDocs).foreach { i =>
      val text = CorpusGen.pageAt(cfg, i).text
      assert(Lemmatizer.lemmaCountsFast(text) == Lemmatizer.lemmaCounts(text), s"doc $i diverges")
    }
  }

  test("fast == spec on adversarial hand cases") {
    val cases = Seq(
      "", "а", "аб", "абв", "АБВ ГДЕ", "ёжик мёд всё",
      "слово123слово", "x y z", "  многие   пробелы  ",
      "был БЫЛ БыЛ", "под надо ура increíble",
      "токен\tтаб\nперенос", "абвгдеёжзийклмнопрстуфхцчшщъыьэюя")
    cases.foreach { t =>
      assert(Lemmatizer.lemmaCountsFast(t) == Lemmatizer.lemmaCounts(t), s"'$t' diverges")
    }
  }

  /** The fused byte-scan build kernel (raw html bytes → lemma counts, no
    * intermediate strings) must equal clean-then-lemmatize on raw HTML. */
  private def specFromHtml(html: Array[Byte]): Map[String, Long] =
    Lemmatizer.lemmaCounts(graft.core.HtmlText.cleanToTextFast(
      new String(html, java.nio.charset.StandardCharsets.UTF_8)))
      .map { case (k, v) => k -> v.toLong }

  test("fused html byte-scan == clean+lemmatize on 400 generated pages") {
    val cfg = CorpusGen.Config(nSites = 2, pagesPerSite = 200, seed = 11L)
    (0L until cfg.nDocs).foreach { i =>
      val html = CorpusGen.pageAt(cfg, i).html
      assert(Lemmatizer.lemmaCountsFromHtml(html) == specFromHtml(html),
        s"doc $i diverges")
    }
  }

  test("fused html byte-scan == clean+lemmatize on adversarial html") {
    val cases = Seq(
      "", "<p>абв где</p>", "аб<b>в</b>где", "<div class=\"абв\">ёлка</div>",
      "&amp;абв&lt;где&gt;", "слово&quot;слово", "АБВ<br/>ГДЕ",
      "<title>был и есть</title><body>токен</body>",
      "незакрытый <tag без конца", "текст > с голой скобкой",
      "<p>ё всё мёд</p>", "обрыв юникода д", "хвост<")
    cases.foreach { t =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(Lemmatizer.lemmaCountsFromHtml(b) == specFromHtml(b), s"'$t' diverges")
    }
  }
}

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
}

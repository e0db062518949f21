package graft

import graft.core._

/** Pure-Scala transcription of the reference search pipeline
  * (SearchServiceImpl.java:51-81 and callees) — NO Spark. The engine must
  * be rank-identical to this oracle on the fixture corpus/query set
  * (SURVEY.md §5.1). Tie-breaks pinned (df ASC, term ASC) for query-lemma
  * order and (score DESC, url ASC) for results — documented spec extension
  * over the reference's nondeterministic ties (SURVEY.md §2.6 O4).
  */
object RefOracle {

  final case class Doc(url: String, site: String, html: String) {
    val text: String = HtmlText.cleanToText(html) // stripHtml, MorphologyServiceImpl.java:288-290
    val lemmaCounts: Map[String, Int] = Lemmatizer.lemmaCounts(text)
    val dl: Long = lemmaCounts.values.sum.toLong
  }

  final case class Result(url: String, relevance: Double, absRelevance: Double)
  final case class Response(count: Int, results: Seq[Result])

  final class Corpus(val docs: Seq[Doc]) {
    // lemma.frequency = per-site document frequency (MorphologyServiceImpl.java:96-99)
    val dfBySite: Map[(String, String), Int] = docs
      .flatMap(d => d.lemmaCounts.keys.map(t => (t, d.site)))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    def dfGlobal(term: String): Int =
      dfBySite.collect { case ((t, _), c) if t == term => c }.sum
    def dfScoped(term: String, site: Option[String]): Int = site match {
      case Some(s) => dfBySite.getOrElse((term, s), 0)
      case None => dfGlobal(term)
    }
    val nDocs: Long = docs.size.toLong
    val avgdl: Double = if (docs.isEmpty) 0.0 else docs.map(_.dl).sum.toDouble / docs.size
  }

  /** Full reference search. scorer=ReferenceTfSum reproduces the reference
    * ranking; scorer=Bm25 is the primary BM25 ordering over the same
    * conjunctive candidate set (global df/N/avgdl). */
  def search(corpus: Corpus, query: String, site: Option[String],
      scorer: Scorer = ReferenceTfSum): Response = {
    // query analysis (SearchServiceImpl.java:62)
    val qLemmas = Lemmatizer.lemmaCounts(query).keys.toSeq.sorted
    if (qLemmas.isEmpty) return Response(0, Seq.empty)

    // 80% pruning vs scoped page count (removeFerquenterLemmas, :329-344)
    val scopedDocs = site.fold(corpus.docs)(s => corpus.docs.filter(_.site == s))
    val pageCount = scopedDocs.size
    val dfMap = qLemmas.map(t => t -> corpus.dfScoped(t, site)).toMap
    val surviving = qLemmas.filter(t =>
      pageCount > 0 && dfMap(t).toDouble / pageCount * 100.0 <= 80.0)
    if (surviving.isEmpty) return Response(0, Seq.empty)

    // rarest-first (sortLemmasMap, :311-319), pinned ties
    val ordered = surviving.sortBy(t => (dfMap(t), t))

    // conjunctive intersection (findPageMatchingQuery, :231-243)
    val candidates = scopedDocs.filter(d => ordered.forall(d.lemmaCounts.contains))
    if (candidates.isEmpty) return Response(0, Seq.empty)

    // scoring
    val scored = candidates.map { d =>
      val abs = ordered.map(t => d.lemmaCounts(t).toDouble).sum // SearchPageData.java:28-32
      val s = scorer match {
        case ReferenceTfSum => abs
        case bm: Bm25 =>
          ordered.map { t =>
            bm.termScore(d.lemmaCounts(t).toDouble, corpus.dfGlobal(t).toLong,
              corpus.nDocs, d.dl.toDouble, corpus.avgdl)
          }.sum
        case other =>
          ordered.map(t => other.termScore(d.lemmaCounts(t).toDouble,
            corpus.dfGlobal(t).toLong, corpus.nDocs, d.dl.toDouble, corpus.avgdl)).sum
      }
      (d.url, s, abs)
    }
    val finalScores = scorer match {
      case ReferenceTfSum =>
        val maxAbs = scored.map(_._3).max // resolveRelRelevance, :251-255
        scored.map { case (u, _, abs) => Result(u, abs / maxAbs, abs) }
      case _ =>
        scored.map { case (u, s, abs) => Result(u, s, abs) }
    }
    val rankedAll = finalScores.sortBy(r => (-r.relevance, r.url))
    Response(rankedAll.size, rankedAll)
  }
}

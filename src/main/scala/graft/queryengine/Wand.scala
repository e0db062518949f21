package graft.queryengine

import graft.core.{PostingCodec, Scorer}

/** Conjunctive posting-list intersection with block-max WAND pruning —
  * the rebuild of the reference's O(n·m) `List.contains` intersection
  * (SearchServiceImpl.java:231-243) as a streaming seek-based evaluator
  * over compressed segments (north_rule; SURVEY.md §2.9).
  *
  * Two modes:
  *  - exact = true  → every match is visited: exact total `count`
  *    (reference returns the pre-pagination total,
  *    SearchServiceImpl.java:108) and exact scores for ALL matches
  *    (needed for site-scoped re-filtering and tf-sum normalization).
  *  - exact = false → block-max pruned top-k: when the running top-k
  *    threshold exceeds the sum of the current blocks' score upper
  *    bounds, whole blocks are skipped WITHOUT decoding (the codec's
  *    block headers carry lastDoc + maxTf). `count` is then a lower
  *    bound — the scale path for p95 latency (like any WAND engine,
  *    total hit counts are estimated when pruning).
  */
object Wand {

  final case class Hit(docId: Long, score: Double, tfSum: Double)
  final case class ShardResult(hits: Array[Hit], matchCount: Long)

  /** Per-query-term scoring context (df/idf fixed per term). */
  final case class TermCtx(term: String, df: Long)

  /** Streaming cursor over one encoded segment with block-skip seek. */
  final class TermCursor(bytes: Array[Byte]) {
    private val r = new PostingCodec.Reader(bytes, 0)
    private val totalEntries: Long = r.readVarLong()
    private var seen = 0L
    private var prevBlockLast = 0L

    private var block: Array[PostingCodec.Posting] = null
    private var blockPos = 0
    private var blockMaxOfCurrent = 0L
    // current undecoded block header
    private var hdrCount = 0
    private var hdrLastDoc = 0L
    private var hdrMaxTf = 0L
    private var hdrPayloadLen = 0L

    var exhausted: Boolean = totalEntries == 0L

    private def loadHeader(): Boolean = {
      if (seen >= totalEntries) return false
      hdrCount = r.readVarLong().toInt
      hdrLastDoc = prevBlockLast + r.readVarLong()
      hdrMaxTf = r.readVarLong()
      hdrPayloadLen = r.readVarLong()
      true
    }

    private def decodeHeaderBlock(): Unit = {
      val out = new Array[PostingCodec.Posting](hdrCount)
      var prevDoc = prevBlockLast
      var j = 0
      while (j < hdrCount) {
        val doc = prevDoc + r.readVarLong()
        val tf = r.readVarLong()
        val dl = r.readVarLong()
        out(j) = PostingCodec.Posting(doc, tf, dl)
        prevDoc = doc
        j += 1
      }
      seen += hdrCount
      prevBlockLast = hdrLastDoc
      blockMaxOfCurrent = hdrMaxTf
      block = out
      blockPos = 0
    }

    private def skipHeaderBlock(): Unit = {
      r.skip(hdrPayloadLen)
      seen += hdrCount
      prevBlockLast = hdrLastDoc
    }

    // position on first posting
    if (!exhausted) { if (loadHeader()) decodeHeaderBlock() else exhausted = true }

    def doc: Long = block(blockPos).docId
    def tf: Long = block(blockPos).tf
    def dl: Long = block(blockPos).dl

    /** Upper-bound info for block-max pruning: the decoded block's max tf
      * and its last docId. */
    def curBlockMaxTf: Long = blockMaxOfCurrent
    def curBlockLastDoc: Long = prevBlockLast

    /** Advance one posting. */
    def next(): Unit = {
      blockPos += 1
      if (blockPos >= block.length) {
        if (loadHeader()) decodeHeaderBlock() else exhausted = true
      }
    }

    /** Seek to the first posting with docId >= target, skipping whole
      * blocks via headers (no decode) where possible. */
    def advanceTo(target: Long): Unit = {
      if (exhausted) return
      // fast path inside current block
      if (block(block.length - 1).docId >= target) {
        // binary search within block from blockPos
        var lo = blockPos
        var hi = block.length - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (block(mid).docId < target) lo = mid + 1 else hi = mid
        }
        blockPos = lo
        return
      }
      // skip blocks
      var found = false
      while (!found) {
        if (!loadHeader()) { exhausted = true; return }
        if (hdrLastDoc >= target) {
          decodeHeaderBlock()
          var lo = 0
          var hi = block.length - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (block(mid).docId < target) lo = mid + 1 else hi = mid
          }
          blockPos = lo
          found = true
        } else skipHeaderBlock()
      }
    }
  }

  /** Top-k buffer keeping ALL ties with the k-th score so the global
    * (score DESC, url ASC) pin (SURVEY.md §2.6 O4) stays exact after the
    * driver merge. */
  final class TopK(k: Int) {
    private var buf = scala.collection.mutable.ArrayBuffer.empty[Hit]
    private var thresholdValid = false
    private var kth = Double.NegativeInfinity
    // compaction trigger; grows when ties keep the buffer large so a tie-
    // heavy stream doesn't re-sort on every add
    private var cap: Int = math.max(256, math.min(k, 1 << 20) * 4)

    def threshold: Double = if (thresholdValid) kth else Double.NegativeInfinity

    def add(h: Hit): Unit = {
      if (thresholdValid && h.score < kth) return
      buf += h
      if (buf.length > cap) {
        compact()
        if (buf.length * 2 > cap) cap = buf.length * 2
      }
    }

    private def compact(): Unit = {
      val sorted = buf.sortBy(-_.score)
      if (sorted.length >= k && k > 0) {
        val cut = sorted(k - 1).score
        buf = sorted.takeWhile(_.score >= cut)
        kth = cut
        thresholdValid = true
      } else buf = sorted
    }

    def result(): Array[Hit] = {
      compact()
      buf.toArray
    }
  }

  /** Evaluate one doc shard: conjunctive AND of all terms, rarest first
    * (reference O1, SearchServiceImpl.java:68-73). `termSegs` is ordered
    * (df ASC, term ASC) by the caller; a term with no segment in this
    * shard means no matches (empty cursor).
    *
    * Returns per-shard top-k (ties kept) + exact/lower-bound match count.
    */
  def evaluateShard(
      termSegs: Seq[(TermCtx, Option[Array[Byte]])],
      scorer: Scorer,
      nDocs: Long,
      avgdl: Double,
      k: Int,
      exact: Boolean): ShardResult = {

    if (termSegs.isEmpty || termSegs.exists(_._2.isEmpty))
      return ShardResult(Array.empty, 0L)

    val ctxs = termSegs.map(_._1).toArray
    val cursors = termSegs.map(ts => new TermCursor(ts._2.get)).toArray
    if (cursors.exists(_.exhausted)) return ShardResult(Array.empty, 0L)

    val topk = new TopK(k)
    var count = 0L
    val m = cursors.length

    var continue = true
    while (continue && !cursors(0).exhausted) {
      val cand = cursors(0).doc
      var allMatch = true
      var resume = false
      var i = 1
      while (i < m && allMatch) {
        cursors(i).advanceTo(cand)
        if (cursors(i).exhausted) { allMatch = false; continue = false }
        else if (cursors(i).doc != cand) {
          // realign the rarest cursor to the blocker's doc
          cursors(0).advanceTo(cursors(i).doc)
          allMatch = false
          resume = true
        }
        i += 1
      }
      if (allMatch) {
        var score = 0.0
        var tfSum = 0.0
        var j = 0
        while (j < m) {
          val c = cursors(j)
          score += scorer.termScore(c.tf.toDouble, ctxs(j).df, nDocs, c.dl.toDouble, avgdl)
          tfSum += c.tf.toDouble
          j += 1
        }
        count += 1L
        topk.add(Hit(cand, score, tfSum))
        // block-max pruning: if no doc in the current blocks can beat the
        // threshold, jump past the nearest block end.
        if (!exact) {
          val th = topk.threshold
          if (th > Double.NegativeInfinity) {
            var ub = 0.0
            var minBlockEnd = Long.MaxValue
            var j2 = 0
            while (j2 < m) {
              val c = cursors(j2)
              ub += scorer.upperBound(c.curBlockMaxTf.toDouble, ctxs(j2).df, nDocs, 0.0, avgdl)
              if (c.curBlockLastDoc < minBlockEnd) minBlockEnd = c.curBlockLastDoc
              j2 += 1
            }
            // strict <: TopK keeps ALL ties with the k-th score, and a
            // TIGHT upper bound (TfSum's ub is achievable) at ub == th
            // can sit over a doc scoring exactly th — skipping it would
            // drop a tie the exact path keeps
            if (ub < th && minBlockEnd > cand) {
              cursors(0).advanceTo(minBlockEnd + 1)
            } else cursors(0).next()
          } else cursors(0).next()
        } else cursors(0).next()
      } else if (resume && cursors(0).exhausted) continue = false
    }

    ShardResult(topk.result(), count)
  }
}

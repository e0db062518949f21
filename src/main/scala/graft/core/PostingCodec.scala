package graft.core

import java.io.ByteArrayOutputStream

/** Posting-list segment codec: delta + unsigned-varint compression of
  * doc-id-sorted (docId, tf, dl) runs, in skippable blocks carrying
  * block-max term frequency (north_rule: "term-partitioned posting-list
  * construction with per-partition sort + delta/varint compression ...
  * block-max WAND pruning").
  *
  * The reference stores one relational row per posting
  * (IndexEntity.java:9-27) — no compression; this codec is the scale path
  * that replaces it (SURVEY.md §1.3, §2.9).
  *
  * Wire format (all ints unsigned LEB128 varints):
  *   segment  := entryCount block*
  *   block    := blockEntryCount blockLastDocDelta maxTf payloadByteLen payload
  *   payload  := (docDelta tf dl)*        // docDelta vs previous docId
  *
  * `blockLastDocDelta` (delta of the block's last docId vs the previous
  * block's last docId) + `payloadByteLen` let WAND skip a whole block —
  * advance the cursor without decoding — when the block's score upper
  * bound (from maxTf) can't beat the current top-k threshold.
  *
  * tf is an integral occurrence count (the reference persists it as
  * DOUBLE `rating`, MorphologyServiceImpl.java:164-170). dl = document
  * token length, carried per posting so BM25's length normalization is
  * computable segment-locally with no doc-table broadcast (the same
  * trade Lucene makes with per-doc norms; costs ~1 varint/posting).
  */
object PostingCodec extends Serializable {
  val BlockSize = 128

  final case class Posting(docId: Long, tf: Long, dl: Long)

  private def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint requires non-negative, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  final class Reader(bytes: Array[Byte], var pos: Int) {
    def readVarLong(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def skip(n: Long): Unit = pos += n.toInt
    def hasMore: Boolean = pos < bytes.length
  }

  /** Encode a doc-id-sorted run. Strict sortedness enforced (the index
    * build sorts within partitions; fail fast otherwise). */
  def encode(postings: Array[Posting]): Array[Byte] = {
    val out = new ByteArrayOutputStream(postings.length * 3 + 16)
    writeVarLong(out, postings.length.toLong)
    var i = 0
    var prevBlockLast = 0L
    while (i < postings.length) {
      val end = math.min(i + BlockSize, postings.length)
      val payload = new ByteArrayOutputStream((end - i) * 3)
      var prevDoc = prevBlockLast
      var maxTf = 0L
      var j = i
      while (j < end) {
        val p = postings(j)
        require(j == 0 || p.docId > postings(j - 1).docId,
          "postings must be strictly sorted by docId")
        writeVarLong(payload, p.docId - prevDoc)
        writeVarLong(payload, p.tf)
        writeVarLong(payload, p.dl)
        if (p.tf > maxTf) maxTf = p.tf
        prevDoc = p.docId
        j += 1
      }
      val blockLast = postings(end - 1).docId
      writeVarLong(out, (end - i).toLong)
      writeVarLong(out, blockLast - prevBlockLast)
      writeVarLong(out, maxTf)
      writeVarLong(out, payload.size().toLong)
      payload.writeTo(out)
      prevBlockLast = blockLast
      i = end
    }
    out.toByteArray
  }

  /** Encode from primitive parallel arrays [0, n) — the build hot path.
    * Identical wire format to [[encode]]; avoids materializing one
    * Posting object per row (the build encodes ~10^8s of postings per
    * partition wave, and per-posting allocation is pure GC pressure). */
  def encodeRaw(docIds: Array[Long], tfs: Array[Long], dls: Array[Long],
      n: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(n * 3 + 16)
    writeVarLong(out, n.toLong)
    var i = 0
    var prevBlockLast = 0L
    while (i < n) {
      val end = math.min(i + BlockSize, n)
      val payload = new ByteArrayOutputStream((end - i) * 3)
      var prevDoc = prevBlockLast
      var maxTf = 0L
      var j = i
      while (j < end) {
        require(j == 0 || docIds(j) > docIds(j - 1),
          "postings must be strictly sorted by docId")
        writeVarLong(payload, docIds(j) - prevDoc)
        writeVarLong(payload, tfs(j))
        writeVarLong(payload, dls(j))
        if (tfs(j) > maxTf) maxTf = tfs(j)
        prevDoc = docIds(j)
        j += 1
      }
      val blockLast = docIds(end - 1)
      writeVarLong(out, (end - i).toLong)
      writeVarLong(out, blockLast - prevBlockLast)
      writeVarLong(out, maxTf)
      writeVarLong(out, payload.size().toLong)
      payload.writeTo(out)
      prevBlockLast = blockLast
      i = end
    }
    out.toByteArray
  }

  /** Full decode (tests, merge, brute-force paths). */
  def decode(bytes: Array[Byte]): Array[Posting] = {
    val r = new Reader(bytes, 0)
    val n = r.readVarLong().toInt
    val out = new Array[Posting](n)
    var written = 0
    var prevBlockLast = 0L
    while (written < n) {
      val cnt = r.readVarLong().toInt
      val blockLastDelta = r.readVarLong()
      r.readVarLong() // maxTf (unused on full decode)
      r.readVarLong() // payload length (unused on full decode)
      var prevDoc = prevBlockLast
      var j = 0
      while (j < cnt) {
        val doc = prevDoc + r.readVarLong()
        val tf = r.readVarLong()
        val dl = r.readVarLong()
        out(written) = Posting(doc, tf, dl)
        prevDoc = doc
        written += 1
        j += 1
      }
      prevBlockLast = prevBlockLast + blockLastDelta
    }
    out
  }

  /** Sort-merge already-sorted segments of the SAME term into one segment.
    * Duplicate docIds must not occur across segments of one term — each
    * doc is indexed by exactly one batch; enforced. Used by SegmentMerge
    * (SURVEY.md §2.9). */
  def merge(segments: Seq[Array[Byte]]): Array[Byte] = {
    val all = segments.map(decode)
    val n = all.map(_.length).sum
    val out = new Array[Posting](n)
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
      Ordering.by[(Long, Int), Long](_._1).reverse)
    val idx = Array.fill(all.size)(0)
    for (s <- all.indices if all(s).nonEmpty) pq.enqueue((all(s)(0).docId, s))
    var w = 0
    while (pq.nonEmpty) {
      val (_, s) = pq.dequeue()
      val p = all(s)(idx(s))
      require(w == 0 || out(w - 1).docId < p.docId,
        s"duplicate/unsorted docId ${p.docId} across segments of one term")
      out(w) = p
      w += 1
      idx(s) += 1
      if (idx(s) < all(s).length) pq.enqueue((all(s)(idx(s)).docId, s))
    }
    encode(out)
  }
}

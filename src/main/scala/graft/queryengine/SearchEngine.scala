package graft.queryengine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{HtmlText, Lemmatizer, Scorer, PostingCodec, ReferenceTfSum, Snippet}
import graft.index.IndexBuild

/** API row (reference SearchItemData.java:9-16). */
final case class SearchItem(
    site: String, siteName: String, uri: String,
    title: String, snippet: String, relevance: Double)

/** API response (reference SearchResponse.java:8-12): `count` is the
  * TOTAL match count pre-pagination (SearchServiceImpl.java:108). */
final case class SearchResponse(result: Boolean, count: Long, data: Seq[SearchItem])

/** The query engine — Spark rebuild of `SearchServiceImpl.search`
  * (SearchServiceImpl.java:51-81), per the trace in SURVEY.md §3.1:
  *
  *   driver lemmatizes the query (U4/U5) → reads `lemma_stats` for the
  *   query terms only (partition-prunable point lookups) → 80% stop-lemma
  *   pruning (F5) → rarest-first order (O1, ties pinned (df ASC, term
  *   ASC)) → distributed shard-local conjunctive WAND over compressed
  *   segments (J1) → driver top-k merge (O2, ties pinned (score DESC,
  *   url ASC)) → presentation join for the page slice only (title U2 +
  *   snippet U3) → offset/limit slice with pre-slice total (O3).
  *
  * Scale notes: the only per-query distributed work is the segment scan,
  * pruned to the query terms' buckets; unsalted (tail) term segments are
  * replicated to each doc shard only when the query also contains a
  * salted head term, so a tail-only query runs a single task. Site-scoped
  * queries evaluate exact (all matches scored, then filtered by site) —
  * at production scale that variant would read a site-partitioned index
  * instead.
  */
final class SearchEngine(
    spark: SparkSession,
    indexDir: String,
    pagesPath: String,
    scorer: Scorer = ReferenceTfSum) {

  import spark.implicits._

  private val stats = spark.read.parquet(s"$indexDir/stats").collect()(0)
  val nDocs: Long = stats.getAs[Long]("n_docs")
  val avgdl: Double = stats.getAs[Double]("avgdl")
  val shards: Int = stats.getAs[Int]("shards")

  private val docsDf = spark.read.parquet(s"$indexDir/docs").cache()
  private val lemmaStatsDf = spark.read.parquet(s"$indexDir/lemma_stats").cache()
  // Warm-engine cache of the merged index. In-sandbox the whole index fits
  // in memory; on a 100 TB corpus this would be uncached parquet reads with
  // bucket partition pruning + executor page cache instead.
  private val segmentsDf = spark.read.parquet(s"$indexDir/index").cache()

  /** Head (salted) terms — tiny by construction (df > threshold). */
  private val headTerms: Set[String] =
    try spark.read.parquet(s"$indexDir/head_terms").as[String].collect().toSet
    catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }

  private val docCountBySite: Map[String, Long] =
    docsDf.groupBy("site").count().as[(String, Long)].collect().toMap

  // Driver-side term-stats cache (the index is immutable once built, so
  // cached df values never go stale). Saves one Spark job per repeated
  // query term — term stats caching is standard in IR engines; at 10^12
  // docs lemma_stats is huge but the per-query term set is tiny, so an
  // LRU over point lookups is exactly right.
  private val dfCache = scala.collection.mutable.HashMap.empty[String, Long]

  // Hot-posting cache: collected segment rows per term (bounded LRU by
  // total bytes). A cache-hit query runs ZERO Spark jobs — pure driver
  // WAND. Only terms whose segments were small enough to fetch locally
  // are cached; the distributed path for huge terms bypasses it.
  private val postingCacheLimit: Long =
    sys.env.getOrElse("SPARK_GRAFT_POSTING_CACHE_BYTES", (256L * 1024 * 1024).toString).toLong
  private val postingCache =
    new java.util.LinkedHashMap[String, Seq[(Int, Array[Byte])]](64, 0.75f, true) {
      private def bytesOf(v: Seq[(Int, Array[Byte])]): Long = v.map(_._2.length.toLong).sum
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[(Int, Array[Byte])]]): Boolean = {
        var total = 0L
        val it = entrySet().iterator()
        while (it.hasNext) total += bytesOf(it.next().getValue)
        total > postingCacheLimit && size() > 1
      }
    }

  /** Global df for the given terms, via cache; misses fetched in ONE
    * filtered lemma_stats scan. Terms absent from the index cache as 0. */
  private def globalDf(terms: Seq[String]): Map[String, Long] = {
    val misses = terms.filterNot(dfCache.contains)
    if (misses.nonEmpty) {
      val fetched = lemmaStatsDf
        .filter(col("term").isin(misses: _*))
        .groupBy("term").agg(sum("df").as("df"))
        .as[(String, Long)].collect().toMap
      misses.foreach(t => dfCache.update(t, fetched.getOrElse(t, 0L)))
    }
    terms.map(t => t -> dfCache(t)).toMap
  }

  // Reference query-result cache: previous query's full ranked result is
  // reused when the SAME query paginates with offset != 0
  // (SearchServiceImpl.java:35-36, 53-57; quirk preserved per §7 H6).
  private var lastQuery: String = ""
  private var lastRanked: Seq[RankedHit] = Seq.empty
  private var lastSurviving: Seq[String] = Seq.empty

  private final case class RankedHit(url: String, site: String, relevance: Double)

  def search(query: String, offset: Int, limit: Int,
      siteUrl: Option[String] = None): SearchResponse = {
    if (lastQuery == query && offset != 0)
      return present(lastRanked, lastSurviving, offset, limit)
    lastQuery = query

    val site = siteUrl.map(IndexBuild.siteOf)
    // 1. analyze the query string (MorphologyServiceImpl.java:212-240)
    val qLemmas = Lemmatizer.lemmaCounts(query).keys.toSeq.sorted
    if (qLemmas.isEmpty) {
      lastRanked = Seq.empty; lastSurviving = Seq.empty
      return SearchResponse(true, 0L, Seq.empty)
    }

    // 2. df per query term — scoped sum over lemma rows
    //    (SearchServiceImpl.java:354-361)
    val dfMap: Map[String, Long] = site match {
      case None => globalDf(qLemmas)
      case Some(s) => lemmaStatsDf.filter(col("site") === s)
        .filter(col("term").isin(qLemmas: _*))
        .groupBy("term").agg(sum("df").as("df"))
        .as[(String, Long)].collect().toMap
    }

    // 3. 80% stop-lemma pruning against the scoped page count
    //    (SearchServiceImpl.java:66, 329-344)
    val pageCount = site.fold(nDocs)(s => docCountBySite.getOrElse(s, 0L))
    val surviving = qLemmas.filter { t =>
      pageCount > 0 && dfMap.getOrElse(t, 0L).toDouble / pageCount * 100.0 <= 80.0
    }
    // 4. rarest-first order, ties pinned (df ASC, term ASC) — O1/O4
    val ordered = surviving.sortBy(t => (dfMap.getOrElse(t, 0L), t))
    lastSurviving = ordered

    if (ordered.isEmpty) {
      lastRanked = Seq.empty
      return SearchResponse(true, 0L, Seq.empty)
    }
    if (ordered.exists(dfMap.getOrElse(_, 0L) == 0L)) {
      // a term with no postings ⇒ conjunction is empty
      // (reference intersects with an empty page list)
      lastRanked = Seq.empty
      return SearchResponse(true, 0L, Seq.empty)
    }

    // 5. distributed conjunctive WAND over segments. Parity path: the
    //    reference materializes the FULL ranked list (it needs the exact
    //    pre-pagination total, the global max for normalization, and the
    //    pagination cache) — so search() runs exact with unbounded k;
    //    topK() below is the pruned scale path.
    // Scoring df is GLOBAL (idf is a corpus statistic) even when the
    // pruning/ordering df above is site-scoped (the reference's pruning
    // reads scoped df, SearchServiceImpl.java:329-344; BM25 idf does not
    // exist in the reference, so the spec pins it to corpus-global).
    val scoreDfMap: Map[String, Long] =
      if (site.isEmpty) dfMap else globalDf(ordered)
    val (hits, totalCount) = runWand(ordered, scoreDfMap, Int.MaxValue, exact = true)

    // 6. resolve urls/sites for hits; scoped filter; rank with pinned ties
    val hitsDf = hits.map(h => (h.docId, h.score, h.tfSum)).toSeq
      .toDF("doc_id", "score", "tf_sum")
    val joined = hitsDf.join(docsDf.select("doc_id", "url", "site"), Seq("doc_id"))
    val filtered = site.fold(joined)(s => joined.filter(col("site") === s))
    val rows = filtered.select("url", "site", "score", "tf_sum")
      .as[(String, String, Double, Double)].collect()

    val count = rows.length.toLong
    assert(site.isDefined || count == totalCount,
      s"hit-count mismatch: joined $count vs WAND $totalCount")
    if (rows.isEmpty) {
      lastRanked = Seq.empty
      return SearchResponse(true, 0L, Seq.empty)
    }

    // relevance: tf-sum normalizes by the max abs relevance over the
    // (scoped) result set (SearchServiceImpl.java:251-255); BM25 is
    // reported absolute.
    val ranked = scorer match {
      case ReferenceTfSum =>
        val maxAbs = rows.map(_._4).max
        rows.map(r => RankedHit(r._1, r._2, r._4 / maxAbs))
      case _ =>
        rows.map(r => RankedHit(r._1, r._2, r._3))
    }
    val sortedHits = ranked.sortBy(h => (-h.relevance, h.url)).toSeq
    lastRanked = sortedHits
    SearchResponse(true, count,
      present(sortedHits, ordered, offset, limit).data)
  }

  /** Top-k only (the bench path): block-max pruned WAND, no presentation.
    * Returns (docId, score) ranked (score DESC, url-independent docId ASC). */
  def topK(query: String, k: Int, pruned: Boolean = true): Seq[(Long, Double)] = {
    val qLemmas = Lemmatizer.lemmaCounts(query).keys.toSeq.sorted
    if (qLemmas.isEmpty) return Seq.empty
    val dfMap: Map[String, Long] = globalDf(qLemmas)
    val surviving = qLemmas.filter(t =>
      dfMap.getOrElse(t, 0L).toDouble / nDocs * 100.0 <= 80.0)
    val ordered = surviving.sortBy(t => (dfMap.getOrElse(t, 0L), t))
    if (ordered.isEmpty || ordered.exists(dfMap.getOrElse(_, 0L) == 0L)) return Seq.empty
    val (hits, _) = runWand(ordered, dfMap, k, exact = !pruned)
    hits.sortBy(h => (-h.score, h.docId)).take(k).map(h => (h.docId, h.score)).toSeq
  }

  /** Distributed WAND: shard-grouped evaluation over the merged index. */
  private def runWand(
      ordered: Seq[String],
      dfMap: Map[String, Long],
      k: Int,
      exact: Boolean): (Array[Wand.Hit], Long) = {

    val cachedTerms = ordered.filter(t => postingCache.containsKey(t))
    val missing = ordered.filterNot(cachedTerms.contains)
    val buckets = missing.map(IndexBuild.termBucket(_, bucketCount)).distinct
    val segs = segmentsDf
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(missing: _*))
      .select("term", "shard", "doc_count", "postings")
      .as[(String, Int, Int, Array[Byte])]

    val anySalted = ordered.exists(headTerms.contains)
    // Cheap cardinality estimate from segment METADATA (doc_count column —
    // no posting decode): moderate queries evaluate driver-locally in one
    // fetch job; only genuinely large ones pay the shard-shuffle.
    val totalPostings: Long =
      if (!anySalted || missing.isEmpty) 0L // tail-only/cache-hit is local
      else segs.select(sum(col("doc_count"))).as[Long].collect().headOption.getOrElse(0L)
    val localEvalLimit = 2000000L
    val s = shards
    val termsArr = ordered.toArray
    val dfArr = termsArr.map(dfMap)
    val (n, ad, sc) = (nDocs, avgdl, scorer)

    def evalGroup(rows: Seq[(String, Array[Byte])]): Wand.ShardResult = {
      val byTerm = rows.groupBy(_._1)
      val termSegs = termsArr.indices.map { i =>
        val t = termsArr(i)
        val bytes = byTerm.get(t).map { rs =>
          if (rs.size == 1) rs.head._2 else PostingCodec.merge(rs.map(_._2))
        }
        (Wand.TermCtx(t, dfArr(i)), bytes)
      }
      Wand.evaluateShard(termSegs, sc, n, ad, k, exact)
    }

    def cachedRows(terms: Seq[String]): Seq[(String, Int, Array[Byte])] =
      terms.flatMap { t =>
        val rows = postingCache.get(t)
        if (rows == null) Seq.empty else rows.map { case (sh, b) => (t, sh, b) }
      }

    val results: Array[Wand.ShardResult] =
      if (totalPostings <= localEvalLimit) {
        // Local path (tail-only, moderate salted, or full cache hit):
        // fetch missing segments in at most ONE job, cache them, and
        // evaluate doc-shard groups on the driver. A repeated query runs
        // zero Spark jobs.
        val fetched = segs.collect().toSeq
        fetched.groupBy(_._1).foreach { case (t, rs) =>
          postingCache.put(t, rs.map(r => (r._2, r._4)))
        }
        missing.filterNot(t => fetched.exists(_._1 == t))
          .foreach(t => postingCache.put(t, Seq.empty))
        val rows = cachedRows(ordered)
        if (!anySalted) Array(evalGroup(rows.map(r => (r._1, r._3))))
        else (0 until s).map { g =>
          evalGroup(rows.collect {
            case (t, sh, bytes) if sh == g || sh < 0 => (t, bytes)
          })
        }.toArray
      } else {
        // Large query: shard-local distributed WAND. Salted segments
        // stay on their doc shard; unsalted ones replicate to each shard.
        // Re-scan ALL query terms here — the `segs` above covers only
        // cache-missing terms, and driver-cached rows can't feed a
        // distributed evaluation.
        val allBuckets = ordered.map(IndexBuild.termBucket(_, bucketCount)).distinct
        segmentsDf
          .filter(col("bucket").isin(allBuckets: _*) && col("term").isin(ordered: _*))
          .select("term", "shard", "postings")
          .as[(String, Int, Array[Byte])]
          .flatMap { case (t, sh, bytes) =>
            if (sh < 0) (0 until s).map(g => (g, t, bytes)) else Seq((sh, t, bytes))
          }
          .groupByKey(_._1)
          .mapGroups((_, rows) => evalGroup(rows.toSeq.map(r => (r._2, r._3))))
          .collect()
      }

    val hits = results.flatMap(_.hits)
    val count = results.map(_.matchCount).sum
    (hits, count)
  }

  private lazy val bucketCount: Int = IndexBuild.Config().buckets

  /** Presentation: title (U2) + snippet (U3) computed only for the
    * returned slice; uri = site-relative path (LinkToolsBox.getShortUrl,
    * LinkToolsBox.java:120-135). */
  private def present(ranked: Seq[RankedHit], queryLemmas: Seq[String],
      offset: Int, limit: Int): SearchResponse = {
    val slice = ranked.slice(offset, offset + limit)
    val htmlByUrl: Map[String, Array[Byte]] =
      if (slice.isEmpty) Map.empty
      else spark.read.parquet(pagesPath)
        .filter(col("url").isin(slice.map(_.url): _*))
        .select("url", "html").as[(String, Array[Byte])].collect().toMap
    val qSet = queryLemmas.toSet
    val items = slice.map { h =>
      val html = htmlByUrl.get(h.url).map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).getOrElse("")
      val path = {
        val root = "https://" + h.site
        if (h.url == root || h.url == root + "/") "/"
        else h.url.stripPrefix(root)
      }
      SearchItem(
        site = "https://" + h.site,
        siteName = h.site,
        uri = path,
        title = HtmlText.title(html),
        snippet = Snippet.build(HtmlText.bodyText(html), qSet),
        relevance = h.relevance)
    }
    SearchResponse(true, ranked.length.toLong, items)
  }
}

/** Statistics endpoint rebuild (A7/A8; StatisticsServiceImpl.java:27-79):
  * per-site page + lemma counts and totals, as one DataFrame. */
object Statistics {
  def compute(spark: SparkSession, indexDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$indexDir/docs")
    val lemmas = spark.read.parquet(s"$indexDir/lemma_stats")
    val pages = docs.groupBy("site").agg(count(lit(1)).as("pages"))
    val lem = lemmas.groupBy("site").agg(count(lit(1)).as("lemmas"))
    pages.join(lem, Seq("site"), "full_outer")
      .na.fill(0L, Seq("pages", "lemmas"))
      .orderBy("site")
  }
}

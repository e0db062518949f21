package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's operator inventory (SURVEY.md §2) re-expressed over the
  * driver's `documents` / `embeddings` / `events` parquet tables, in forms
  * that are ALSO expressible as ANSI SQL — every function here is paired
  * with a DuckDB oracle query in [[graft.SparkEntry.oracleSql]] and
  * verified value-identically by the driver.
  *
  * The text pipeline uses the Latin analyzer mode (SURVEY.md Analyzer):
  * `lower → split [^a-z]+ → length ≥ 3` — the same tokenize/tf/df/BM25
  * semantics as the Russian reference path, minus lemmatization (the
  * closed Russian dictionary does not apply to the synthetic English
  * corpus; lemmatization itself is oracle-tested in EngineSpec).
  *
  * All floating-point outputs are rounded to 6 dp on BOTH sides so the
  * driver's value-hash comparison is robust to summation-order ulps.
  */
object DocOps {

  val QueryTerms: Seq[String] = Seq("spark", "merge", "batch") // 'batch' df>80% ⇒ pruned
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  // input tables through the store seam (iceberg-readiness: swap the
  // store implementation and these become catalog tables)
  def documents(spark: SparkSession, dir: String): DataFrame =
    graft.store.TableStore.open(spark, dir).read("documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    graft.store.TableStore.open(spark, dir).read("embeddings.parquet")
  def events(spark: SparkSession, dir: String): DataFrame =
    graft.store.TableStore.open(spark, dir).read("events.parquet")

  /** doc_id → tokens (F2/F4 Latin mode; one row per occurrence).
    * Extra columns to carry through ride along via `carry`. */
  def tokens(docs: DataFrame, carry: Column*): DataFrame =
    docs.select(col("doc_id") +: carry :+
        explode(split(lower(col("text")), "[^a-z]+")).as("term"): _*)
      .filter(length(col("term")) >= 3)

  // at most ONE cached plan per call site stays pinned: each call
  // unpersists the previous call's cache before pinning its own, so a
  // long-lived session calling these repeatedly doesn't accumulate dead
  // storage blocks (Spark's CacheManager holds strong refs — entries
  // are never GC-collected)
  private val cacheSlots =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def swapCached(slot: String, df: DataFrame): DataFrame = {
    val cached = df.cache()
    val prev = cacheSlots.put(slot, cached)
    if (prev != null && (prev ne cached)) prev.unpersist()
    cached
  }

  /** A1 — tf per (doc, term): the `index_t.rating` analogue. */
  def tfPostings(spark: SparkSession, dir: String): DataFrame =
    tokens(documents(spark, dir))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "term")

  /** A2 — global document frequency per term (`lemma.frequency`). */
  def dfGlobal(spark: SparkSession, dir: String): DataFrame =
    tokens(documents(spark, dir))
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      .orderBy("term")

  /** A2/F6 — per-source df (reference df is per-site). */
  def dfBySource(spark: SparkSession, dir: String): DataFrame =
    tokens(documents(spark, dir), col("source"))
      .groupBy("term", "source").agg(countDistinct(col("doc_id")).as("df"))
      .orderBy("term", "source")

  /** Doc length (token count) — BM25's dl; zero-token docs kept (dl=0). */
  def docLen(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val dl = tokens(docs).groupBy("doc_id").agg(count(lit(1)).as("dl"))
    docs.select("doc_id").join(dl, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dl"))
      .orderBy("doc_id")
  }

  /** F5 — stop-term pruning: terms on >80% of docs (the reference drops
    * query lemmas with df/pageCount*100 > 80, SearchServiceImpl.java:329-344). */
  def stopTerms80(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val n = docs.count()
    dfGlobal(spark, dir)
      .filter(col("df") * 100.0 / lit(n.toDouble) > 80.0)
      .orderBy("term")
  }

  /** O1 — query-term execution order: surviving terms by (df ASC, term ASC). */
  def rarestFirst(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val n = docs.count()
    dfGlobal(spark, dir)
      .filter(col("term").isin(QueryTerms: _*))
      .filter(col("df") * 100.0 / lit(n.toDouble) <= 80.0)
      .orderBy("df", "term")
  }

  /** Surviving (unpruned) query terms as a local list — shared by the
    * search pipelines; both sides apply the same 80% rule. */
  private def survivingTerms(spark: SparkSession, dir: String): Seq[String] = {
    import spark.implicits._
    rarestFirst(spark, dir).select("term").as[String].collect().toSeq
  }

  /** J1/E1 — conjunctive posting intersection for the fixture query:
    * docs containing ALL surviving terms. groupBy+count==n replaces the
    * reference's O(n·m) List.contains loop (SearchServiceImpl.java:236-243). */
  def conjunction(spark: SparkSession, dir: String): DataFrame = {
    val terms = survivingTerms(spark, dir)
    tokens(documents(spark, dir))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === terms.size)
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** A4 — absolute relevance per matching doc: Σ tf over query terms
    * (SearchPageData.java:28-32). */
  def tfsumScores(spark: SparkSession, dir: String): DataFrame = {
    val terms = survivingTerms(spark, dir)
    tokens(documents(spark, dir))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"), count(lit(1)).as("abs_rel"))
      .filter(col("nt") === terms.size)
      .select(col("doc_id"), col("abs_rel").cast("double").as("abs_rel"))
      .orderBy("doc_id")
  }

  /** A5/O2/O3 — normalized relevance (degenerate unpartitioned window max,
    * SURVEY.md §2.5) + top-10 with pinned ties (rel DESC, doc_id ASC). */
  def tfsumTop10(spark: SparkSession, dir: String): DataFrame =
    tfsumScores(spark, dir)
      .withColumn("rel", round(col("abs_rel") / max(col("abs_rel")).over(Window.partitionBy()), 6))
      .select("doc_id", "rel")
      .orderBy(desc("rel"), col("doc_id"))
      .limit(10)

  /** BM25 (k1=1.2, b=0.75) scores over the conjunctive candidates —
    * the north_rule's primary ranking. Pure Catalyst: tf/df/dl/avgdl
    * aggregations + one join; no UDFs. */
  def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val n = docs.count().toDouble
    val terms = survivingTerms(spark, dir)
    val tok = swapCached("bm25.tok", tokens(docs))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val avgdl = docs.select("doc_id").join(dl, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dl")).agg(avg("dl")).collect()(0).getDouble(0)
    val dfT = tok.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val tf = tok.filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cand = tf.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      .filter(col("nt") === terms.size).select("doc_id")
    val idf = greatest(lit(0.0),
      log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    tf.join(cand, Seq("doc_id"))
      .join(broadcast(dfT), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("score_t",
        idf * col("tf") * (Bm25K1 + 1.0) /
          (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / lit(avgdl))))
      .groupBy("doc_id").agg(round(sum("score_t"), 6).as("score"))
  }

  /** North-rule headline: BM25 top-10, ties pinned (score DESC, doc_id ASC). */
  def bm25Top10(spark: SparkSession, dir: String): DataFrame =
    bm25Scored(spark, dir).orderBy(desc("score"), col("doc_id")).limit(10)

  /** O3 — pagination: rows 11..20 of the BM25 ranking; `offset` requires
    * the full sort (reference slices the materialized list). */
  def bm25Page2(spark: SparkSession, dir: String): DataFrame =
    bm25Scored(spark, dir).orderBy(desc("score"), col("doc_id"))
      .offset(10).limit(10)

  /** F6 — source-scoped tf-sum search (site scoping analogue). */
  def tfsumScoped(spark: SparkSession, dir: String, source: String = "src3"): DataFrame = {
    val docs = documents(spark, dir).filter(col("source") === source)
    val scopedTok = tokens(docs)
    val nScoped = docs.count()
    val dfScoped = scopedTok.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    import spark.implicits._
    val surviving = dfScoped.filter(col("term").isin(QueryTerms: _*))
      .filter(col("df") * 100.0 / lit(nScoped.toDouble) <= 80.0)
      .select("term").as[String].collect().toSeq
    if (surviving.isEmpty) {
      // all query terms pruned in this source — empty result with the
      // SAME schema as the non-empty branch (oracle returns zero rows too)
      import spark.implicits._
      return Seq.empty[(Long, Double)].toDF("doc_id", "rel")
    }
    scopedTok.filter(col("term").isin(surviving: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"), count(lit(1)).as("abs_rel"))
      .filter(col("nt") === surviving.size)
      .withColumn("rel", round(col("abs_rel") / max(col("abs_rel")).over(Window.partitionBy()), 6))
      .select("doc_id", "rel")
      .orderBy(desc("rel"), col("doc_id"))
      .limit(10)
  }

  /** A7 — page counts per site (statistics endpoint). */
  def statsPages(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("pages")).orderBy("source")

  /** A8 — lemma (term) counts per site. */
  def statsLemmas(spark: SparkSession, dir: String): DataFrame =
    tokens(documents(spark, dir), col("source"))
      .groupBy("source").agg(countDistinct(col("term")).as("lemmas"))
      .orderBy("source")

  /** J4 — anti-join (the visited/dedup check): docs containing 'spark'
    * but NOT 'dup'. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val tok = tokens(documents(spark, dir))
    val withSpark = tok.filter(col("term") === "spark").select("doc_id").distinct()
    val withDup = tok.filter(col("term") === "dup").select("doc_id").distinct()
    withSpark.join(withDup, Seq("doc_id"), "left_anti").orderBy("doc_id")
  }

  /** J6/A3 — df merge across batches: split the corpus in two halves,
    * union their per-half dfs, re-aggregate — must equal global df. */
  def dfMerge(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    def half(p: Column): DataFrame =
      tokens(docs.filter(p))
        .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    half(col("doc_id") % 2 === 0).union(half(col("doc_id") % 2 === 1))
      .groupBy("term").agg(sum("df").as("df"))
      .orderBy("term")
  }

  /** E2 — set op: distinct (lang, source) pairs. */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select("lang", "source").distinct()
      .orderBy("lang", "source")

  // ───────────────────────── training-data pipeline ops ─────────────────

  /** Exact dedup: hash-group on md5(text); emits groups with >1 member. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_doc"))
      .filter(col("n") > 1)
      .orderBy("h")

  /** Word-trigram shingles per doc (distinct). Shared by n-gram Jaccard
    * and MinHash. Spark: transform over index sequence (0-based). */
  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        split(lower(col("text")), "[^a-z]+").as("arr"))
      .withColumn("arr", filter(col("arr"), t => length(t) >= 1))
      .filter(size(col("arr")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(arr) - 3), i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))")).as("sh"))
      .distinct()

  /** N-gram Jaccard near-dup pairs: self-join on shingle, Jaccard ≥ 0.3,
    * pinned (a < b). The shuffle key is the shingle — at scale frequent
    * shingles are the skew risk; production path uses MinHash LSH below
    * to avoid the quadratic blowup. */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val sh = swapCached("ngram.sh", shingles(documents(spark, dir)))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), Seq("b"))
      .withColumn("jaccard", round(col("common") / (col("sza") + col("szb") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  /** MinHash signatures: 8 hash functions realized as the lexicographic
    * MIN of md5(seed || ':' || shingle) — portable across engines (md5 is
    * identical everywhere; lexicographic min of the hex digest is a valid
    * uniform min-hash). One aggregate pass computes all 8 mins as
    * separate columns (no seed-explode: an 8x row blow-up before the
    * shuffle), then unpivots — ~8x less shuffle volume. */
  def minhashSignatures(spark: SparkSession, dir: String, nHashes: Int = 8): DataFrame = {
    val sh = shingles(documents(spark, dir))
    val minCols = (0 until nHashes).map { s =>
      min(md5(concat(lit(s.toString), lit(":"), col("sh")).cast("binary"))).as(s"sig$s")
    }
    val wide = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val stackExpr = (0 until nHashes).map(s => s"$s, sig$s").mkString(", ")
    wide.select(col("doc_id"),
        expr(s"stack($nHashes, $stackExpr)").as(Seq("seed", "sig")))
      .orderBy("doc_id", "seed")
  }

  /** MinHash LSH candidate pairs: 4 bands × 2 rows; a pair is a candidate
    * if any band's concatenated signature matches. The band join replaces
    * the quadratic shingle self-join — this is the 100 TB dedup path. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir, 8)
      .withColumn("band", expr("cast(floor(seed / 2) as int)"))
    // deterministic band signature: sigs ordered by seed within the band
    val bandsSorted = sigs.groupBy("doc_id", "band")
      .agg(concat_ws("|", sort_array(collect_list(struct(col("seed"), col("sig")))).getField("sig")).as("bandsig"))
    bandsSorted.as("x").join(bandsSorted.as("y"),
        col("x.band") === col("y.band") && col("x.bandsig") === col("y.bandsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .orderBy("a", "b")
  }

  /** SimHash (16-bit, md5-nibble based): per-token hash bits are summed
    * signed (+1/-1) over DISTINCT tokens; bit i set iff the sum > 0.
    * Fully expressible in SQL on both engines. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = tokens(documents(spark, dir)).distinct()
      .withColumn("h", md5(col("term").cast("binary")))
    // nibble i of md5 hex → 4 bits; use first 4 nibbles = 16 bits
    val withBits = tok.select(col("doc_id"), col("h"),
      explode(expr("transform(sequence(0, 15), i -> i)")).as("bit"))
      .withColumn("nibble",
        expr("instr('0123456789abcdef', substr(h, cast(floor(bit / 4) as int) + 1, 1)) - 1"))
      .withColumn("bitval",
        when(expr("cast(floor(nibble / pow(2, 3 - bit % 4)) as int) % 2") === 1, 1).otherwise(-1))
    withBits.groupBy("doc_id", "bit").agg(sum("bitval").as("s"))
      .withColumn("bitset", when(col("s") > 0, 1L).otherwise(0L))
      .withColumn("weight", expr("cast(pow(2, bit) as bigint)") * col("bitset"))
      .groupBy("doc_id").agg(sum("weight").as("simhash"))
      .orderBy("doc_id")
  }

  /** Register the native cosine expression (idempotent per session). */
  /** The constant md5-derived hyperplane matrix shared by
    * [[annLshBuckets]] and [[embedNearDup]] — plane p, dim i weight =
    * first md5 nibble of "p:i" minus 7.5 (== instr('0..f', hex[0]) - 8.5
    * on the DuckDB oracle side). One definition so the two LSH families
    * can never diverge bit-wise. */
  private def hyperplanes(nPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    def weight(p: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((h(0) >> 4) & 0xf).toDouble - 7.5
    }
    (0 until nPlanes).map(p => (0 until dims).map(i => weight(p, i)))
  }

  private def withCosine(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("graft_cosine"))
      graft.functions.VecExpressions.register(spark)

  /** Embedding-cosine ANN, brute force (the baseline): top-5 neighbours of
    * query vectors 0,1,2 by cosine. The similarity is the native codegen'd
    * [[graft.functions.CosineSim]] expression — one fused loop per pair,
    * no intermediate zip array, bit-identical to the previous
    * aggregate/zip_with form (same fold order). */
  def annCosineTop5(spark: SparkSession, dir: String): DataFrame = {
    withCosine(spark)
    val emb = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val cos = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", round(
        graft.functions.VecExpressions.cosineSim(col("v"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("vec_id"))
    cos.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "vec_id", "cosine")
      .orderBy("qid", "rank")
  }

  /** LSH-bucketed ANN (the scale path): random-hyperplane signatures via
    * md5-derived pseudo-planes; neighbours searched only within the same
    * bucket. Deterministic, no external randomness.
    *
    * The plane matrix is a CONSTANT: plane p, dim i weight = first md5
    * nibble of "p:i" minus 7.5. It is computed once on the driver and
    * shipped as a literal nested-array column — per row the job does only
    * the nPlanes dot products (round 1 re-derived the matrix with 512 md5
    * calls inside the per-row expression: 20% of the whole bench). */
  def annLshBuckets(spark: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    val emb = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dims = emb.select(size(col("v"))).head.getInt(0)
    val planes = hyperplanes(nPlanes, dims)
    emb.withColumn("planes", typedLit(planes))
      .withColumn("bucket", expr(
        s"""aggregate(transform(sequence(0, ${nPlanes - 1}, 1), p ->
           |  case when aggregate(zip_with(v, planes[p], (x, w) -> x * w),
           |                      0D, (acc, x) -> acc + x) > 0
           |       then cast(pow(2, p) as int) else 0 end),
           |  0, (acc, x) -> acc + x)""".stripMargin))
      .groupBy("bucket").agg(count(lit(1)).as("n_vectors"))
      .orderBy("bucket")
  }

  /** Embedding-cosine NEAR-DUPLICATE pairs via BANDED hyperplane LSH —
    * the dedup-family member that works on vectors (complementing exact
    * md5 / MinHash / SimHash / n-gram Jaccard on text).
    *
    * Scale shape (the reason this is not a cross join): the 8 md5-derived
    * hyperplanes (same derivation as [[annLshBuckets]]) are split into 4
    * bands of 2; a pair is a CANDIDATE iff it collides in at least one
    * band (MinHash-style band-OR amplification — per-band match
    * probability (1 - θ/π)² , recall 1-(1-p)⁴). Candidates are found by a
    * shuffle join on (band, signature) — at 10^12 vectors each band
    * bucket holds ~n/2^bits vectors, and production raises planes/band so
    * buckets stay small; the exact cosine (native codegen'd
    * [[graft.functions.CosineSim]]) is computed ONLY for candidates.
    * The fixture threshold 0.4 matches the synthetic table (max pairwise
    * cosine ≈ 0.48 — no planted duplicates); the threshold compares the
    * 6-dp-rounded cosine so the Spark and DuckDB sides agree at the
    * boundary. */
  def embedNearDup(spark: SparkSession, dir: String,
      nPlanes: Int = 8, bandSize: Int = 2, threshold: Double = 0.4): DataFrame = {
    withCosine(spark)
    val emb = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dims = emb.select(size(col("v"))).head.getInt(0)
    val planes = hyperplanes(nPlanes, dims)
    val nBands = nPlanes / bandSize
    // per-vector band signatures: bit p of band b = sign of plane
    // (b*bandSize + p)'s projection
    val sigs = emb.withColumn("planes", typedLit(planes))
      .withColumn("band_sigs", expr(
        s"""transform(sequence(0, ${nBands - 1}, 1), b ->
           |  aggregate(transform(sequence(0, ${bandSize - 1}, 1), p ->
           |    case when aggregate(zip_with(v, planes[b * $bandSize + p], (x, w) -> x * w),
           |                        0D, (acc, x) -> acc + x) > 0
           |         then cast(pow(2, p) as int) else 0 end),
           |    0, (acc, x) -> acc + x))""".stripMargin))
      .select(col("vec_id"),
        posexplode(col("band_sigs")).as(Seq("band", "sig")))
    // candidate generation on IDS ONLY — the full vectors never ride the
    // (band, sig) shuffle, and a pair colliding in several bands is
    // deduplicated BEFORE the cosine, so each candidate pays exactly one
    // exact-cosine evaluation and one vector fetch per side
    val lhs = sigs.select(col("band"), col("sig"), col("vec_id").as("a"))
    val rhs = sigs.select(col("band"), col("sig"), col("vec_id").as("b"))
    val candidates = lhs.join(rhs, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    candidates
      .join(emb.select(col("vec_id").as("a"), col("v").as("va")), Seq("a"))
      .join(emb.select(col("vec_id").as("b"), col("v").as("vb")), Seq("b"))
      .select(col("a"), col("b"),
        round(graft.functions.VecExpressions.cosineSim(col("va"), col("vb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("a", "b")
  }

  /** IVF-style ANN (the coarse-quantizer scale path, complementing the
    * hyperplane LSH above): deterministic centroids = the embeddings of
    * vec_id 0..15 (no k-means iterations — reproducible across engines),
    * every vector assigned to its max-cosine cell. Query-side probing
    * searches only the query's cell. */
  def annIvfCells(spark: SparkSession, dir: String, nCells: Int = 16): DataFrame = {
    withCosine(spark)
    val emb = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), col("cell"))
    emb.crossJoin(broadcast(cents))
      .withColumn("cos", round(
        graft.functions.VecExpressions.cosineSim(col("v"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  /** IVF cell sizes — the balance check a production deployment monitors
    * (skewed cells ⇒ probe hotspots). */
  def annIvfCellSizes(spark: SparkSession, dir: String): DataFrame =
    annIvfCells(spark, dir).groupBy("cell")
      .agg(count(lit(1)).as("n_vectors")).orderBy("cell")

  /** Language-ID heuristic: stopword-list hit counts per candidate
    * language; predicted = argmax (ties → lang asc). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val stop = Map(
      "en" -> Seq("the", "and", "for", "with"),
      "de" -> Seq("der", "und", "die", "mit"),
      "fr" -> Seq("les", "des", "une", "avec"),
      "es" -> Seq("los", "las", "una", "con"))
    val tok = tokens(documents(spark, dir))
    // ONE scan of tokens (round-4 verdict item 5 killed the 4-scan union):
    // a constant CASE chain maps each stopword to its language (the lists
    // are disjoint), then a single map-side-combinable groupBy counts
    // hits per (doc, lang) — no join, no extra scan, codegen'd end to end.
    val langCol = stop.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (lang, words)) => when(col("term").isin(words: _*), lit(lang)).otherwise(acc)
    }
    val hits = tok.withColumn("lang", langCol)
      .filter(col("lang").isNotNull)
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("hits"), col("lang"))
    val pred = hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("hits"))
    documents(spark, dir).select("doc_id")
      .join(pred, Seq("doc_id"), "left")
      .na.fill("unk", Seq("pred_lang")).na.fill(0L, Seq("hits"))
      .orderBy("doc_id")
  }

  /** Text-quality scoring: token count, distinct ratio, mean token length,
    * stopword ratio, and a composite score. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stopwords = Seq("the", "and", "for", "with", "los", "las", "der", "und", "les", "des")
    val tok = tokens(documents(spark, dir))
    val agg = tok.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("term")).as("n_distinct"),
      round(avg(length(col("term"))), 6).as("mean_len"),
      round(sum(when(col("term").isin(stopwords: _*), 1).otherwise(0)) / count(lit(1)).cast("double"), 6).as("stop_ratio"))
    documents(spark, dir).select(col("doc_id"), col("n_chars"))
      .join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens", "n_distinct")).na.fill(0.0, Seq("mean_len", "stop_ratio"))
      .withColumn("quality",
        round(least(lit(1.0), col("n_tokens") / 100.0) *
          (col("n_distinct") / greatest(col("n_tokens").cast("double"), lit(1.0))), 6))
      .orderBy("doc_id")
  }

  /** Document fingerprint: md5 of the '|'-joined sorted distinct tokens —
    * a canonical-content signature (token-order/whitespace invariant). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    tokens(documents(spark, dir)).distinct()
      .groupBy("doc_id")
      .agg(md5(concat_ws("|", sort_array(collect_list(col("term")))).cast("binary")).as("fp"))
      .orderBy("doc_id")

  /** Token counting (BPE-ish regex proxy): whitespace tokens vs subword
    * chunks of ≤4 chars — the chunked count is Σ ceil(len/4). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    tokens(documents(spark, dir))
      .groupBy("doc_id").agg(
        count(lit(1)).as("ws_tokens"),
        sum(ceil(length(col("term")) / 4.0)).cast("long").as("subword_tokens"))
      .orderBy("doc_id")

  // ───────────────────────────── events ops ─────────────────────────────

  /** W — sessionization: 30-min-gap sessions per user via lag + running
    * sum (the batch form of the streaming session-window). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_no")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .orderBy("user_id", "sess_no")
  }

  /** Tumbling 1-hour window aggregation by event_type — the batch parity
    * form of the Structured Streaming windowed agg (graft.streaming). */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("v"))
      .orderBy("hour", "event_type")
}

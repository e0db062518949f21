package graft.corpus

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.SplittableRandom

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{HtmlText, RuDict}

/** One Common-Crawl-style page row — the engine's only input table, shape
  * fixed by BASELINE.json `input_hint`:
  * (url string, warc_ts timestamp, html binary, text string, lang string).
  * Iceberg-shaped; written/read as Parquet in-sandbox (no Iceberg jars —
  * SURVEY.md env facts). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic corpus generator (FIXTURES.md §1).
  *
  * Every page is a pure function of (config, docIndex) — no wall clock, no
  * shared RNG state — so generation parallelizes as `spark.range(n).map`
  * and is byte-reproducible at any scale (unit 500 docs → bench 100k docs,
  * same code path that would feed the 10^12-doc production build).
  *
  * The `text` column is produced BY the engine's own `HtmlText.cleanToText`
  * at generation time, making the reference's per-url byte-identity
  * invariant (`input_hint`; Jsoup cleaner at
  * MorphologyServiceImpl.java:288-290) exact by construction AND still
  * falsifiable: tests re-run the cleaner over the stored html bytes.
  *
  * Distribution design (FIXTURES.md §2):
  *  - word draws are Zipf(s=1.1) over the closed dictionary → guaranteed
  *    head-term skew (exercises salted repartitioning, SURVEY.md §7 H4);
  *  - the stop-lemma «быть» is planted on >80% of pages → exercises the
  *    reference's frequent-lemma pruning (SearchServiceImpl.java:329-344);
  *  - ~10% of pages are lang='en' (Latin text → zero index terms under the
  *    Cyrillic tokenizer, README.md:15);
  *  - ru pages embed Latin words, digits and ё-words to exercise the
  *    destructive tokenizer rules (MorphologyServiceImpl.java:243-250).
  */
object CorpusGen {

  /** avgWords ≈ mean body length; the fixture default (80) keeps unit
    * corpora small, the bench uses web-page-sized docs (~400 words). */
  final case class Config(nSites: Int, pagesPerSite: Int, seed: Long = 42L,
      avgWords: Int = 80) {
    def nDocs: Long = nSites.toLong * pagesPerSite
  }

  val Epoch: Long = 1735689600000L // 2025-01-01T00:00:00Z

  /** splitmix64 avalanche finalizer (public constant mix from the
    * SplittableRandom paper / JDK source). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Zipf(s=1.1) cumulative distribution over content lemmas. */
  private lazy val zipfCdf: Array[Double] = {
    val n = RuDict.contentLemmas.size
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, 1.1))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }

  private def zipfDraw(rng: SplittableRandom): String = {
    val u = rng.nextDouble()
    var lo = 0
    var hi = zipfCdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    RuDict.contentLemmas(lo)
  }

  private val particles: Vector[String] =
    RuDict.paradigms.filter(_._3).flatMap(_._2)

  private val latinNoise = Array("data", "spark", "index2026", "http", "x86")
  private val yoNoise = Array("ёлка", "ёж", "всё")

  /** A surface word for one slot: Zipf lemma → uniform inflected form,
    * with particle / stop-lemma / noise injection. */
  private def drawWord(rng: SplittableRandom, plantStop: Boolean): String = {
    val r = rng.nextInt(100)
    if (r < 5) particles(rng.nextInt(particles.size))
    else if (r < 8 && plantStop) { // extra stop-lemma occurrences
      val f = RuDict.formsOf("быть"); f(rng.nextInt(f.size))
    } else if (r < 10) latinNoise(rng.nextInt(latinNoise.length))
    else if (r < 12) yoNoise(rng.nextInt(yoNoise.length))
    else if (r < 14) (100 + rng.nextInt(900)).toString
    else {
      val lemma = zipfDraw(rng)
      val forms = RuDict.formsOf(lemma)
      forms(rng.nextInt(forms.size))
    }
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** English filler for lang='en' pages (destroyed by the ru tokenizer). */
  private def enWords(rng: SplittableRandom, n: Int): Seq[String] = {
    val vocab = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dog", "search", "engine", "page", "crawl", "index", "query")
    Seq.fill(n)(vocab(rng.nextInt(vocab.length)))
  }

  /** Pure page constructor — the whole corpus is `map(pageAt(cfg, _))`. */
  def pageAt(cfg: Config, idx: Long): PageRow = {
    val site = (idx / cfg.pagesPerSite).toInt
    val n = (idx % cfg.pagesPerSite).toInt
    val url = f"https://site$site%d.test/p/$n%06d"
    val ts = new Timestamp(Epoch + idx * 1000L)
    // splitmix64 finalizer — a plain `seed ^ idx*GOLDEN` correlates with
    // SplittableRandom's own golden-gamma stepping and makes consecutive
    // docs near-identical shifted word streams; the full avalanche mix
    // decorrelates per-doc sequences.
    val rng = new SplittableRandom(mix64(cfg.seed ^ mix64(idx)))
    val isRu = idx % 10 != 7 // deterministic ~90% ru

    val html = new StringBuilder(2048)
    if (isRu) {
      // Plant «быть» on 95% of ru pages → corpus-wide df ≈ 85% > 80%.
      val plantStop = n % 20 != 0
      val titleWords = Seq.fill(3)(drawWord(rng, plantStop = false))
      val nWords = cfg.avgWords / 2 + rng.nextInt(cfg.avgWords)
      val body = Seq.fill(nWords)(drawWord(rng, plantStop))
      val stopSeed = if (plantStop) Seq("был") else Seq.empty
      val allBody = stopSeed ++ body
      html.append("<html><head><title>")
        .append(escape(titleWords.mkString(" ")))
        .append("</title></head><body>")
      // paragraphs of ~15 words with inline <b>/<a> markup
      val paras = allBody.grouped(15).toSeq
      for ((p, pi) <- paras.zipWithIndex) {
        if (pi == 0) html.append("<h1>").append(escape(p.take(4).mkString(" "))).append("</h1>")
        html.append("<p>")
        for ((w, wi) <- p.zipWithIndex) {
          if (wi > 0) html.append(' ')
          if (rng.nextInt(20) == 0) html.append("<b>").append(escape(w)).append("</b>")
          else if (rng.nextInt(25) == 0)
            html.append("<a href=\"/p/").append(rng.nextInt(cfg.pagesPerSite)).append("\">")
              .append(escape(w)).append("</a>")
          else html.append(escape(w))
        }
        if (rng.nextInt(6) == 0) html.append(" &amp; ")
        html.append("</p>")
      }
      html.append("</body></html>")
    } else {
      val words = enWords(rng, 30 + rng.nextInt(40))
      html.append("<html><head><title>")
        .append(escape(words.take(3).mkString(" ")))
        .append("</title></head><body><p>")
        .append(escape(words.mkString(" ")))
        .append("</p></body></html>")
    }

    val htmlStr = html.toString
    PageRow(url, ts, htmlStr.getBytes(StandardCharsets.UTF_8),
      HtmlText.cleanToText(htmlStr), if (isRu) "ru" else "en")
  }

  /** Distributed generation: `spark.range` partitions the id space; each
    * task materializes its own rows — no driver-side data, scales to any
    * nDocs. Partition count defaults to max(cores, 64) so the parquet
    * this produces has enough splits to feed a WIDER session later (a
    * corpus written with 8 files caps every downstream scan at 8 tasks). */
  def generate(spark: SparkSession, cfg: Config, numPartitions: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(spark.sparkContext.defaultParallelism, 64)
    spark.range(0, cfg.nDocs, 1, math.min(parts.toLong, math.max(1L, cfg.nDocs)).toInt)
      .map(i => pageAt(cfg, i))
  }

  /** Crawl-shaped variant: the input_hint schema PLUS the HTTP status
    * column the reference persists per page (Page.java:10-34). A few
    * deterministic non-200 rows exercise the valid-code filter F1
    * (IndexBuild.filterValidCode; MorphologyServiceImpl.java:89-90):
    * ~1/29 are 404, ~1/29 are 500 (both invalid), ~1/29 are 308 (valid
    * redirect per application.yaml:23-25), the rest 200. */
  def generateWithCodes(spark: SparkSession, cfg: Config,
      numPartitions: Int = 0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    generate(spark, cfg, numPartitions).withColumn("code",
      when(pmod(xxhash64(col("url")), lit(29)) === 3, lit(404))
        .when(pmod(xxhash64(col("url")), lit(29)) === 11, lit(500))
        .when(pmod(xxhash64(col("url")), lit(29)) === 17, lit(308))
        .otherwise(lit(200)))
  }

  // ── corpus page-bucket layout (round-6 optimization: presentation
  //    point lookups) ──────────────────────────────────────────────────
  //
  // The search presentation path fetches html for a top-k url slice. An
  // unpartitioned corpus makes that a scan of EVERY corpus file's footer
  // (url min/max stats prune poorly — urls are uniformly scattered), an
  // O(corpus-files) metadata cost per query at 10^12 docs (round-5
  // verdict "What's wrong" #3). Writing the corpus partitioned by
  // pb = pmod(xxhash64(url), buckets) — the same deterministic residue
  // scheme as the docs dim's `db` — lets the engine prune a slice fetch
  // to the slice's own bucket directories. The bucket count is persisted
  // next to the data (`_corpus_meta`, underscore-prefixed so corpus
  // readers never see it) because pruning with a GUESSED count would
  // silently fetch nothing; engines fall back to the unpruned scan when
  // the meta table is absent (pre-round-6 corpora keep working).

  /** Meta-table name (underscore-prefixed: invisible to the root reads). */
  val MetaTable = "_corpus_meta"

  /** Default page-bucket count for CLI-generated corpora. Local-scale
    * default; production picks buckets so each holds O(100) files. */
  val DefaultPageBuckets = 16

  /** Driver-side twin of the write-side column expression
    * `pmod(xxhash64(url), buckets)` — MUST stay in lockstep with
    * [[withPageBucket]] (pruning with a diverging hash would fetch the
    * wrong buckets). */
  def pageBucketOf(url: String, buckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(url),
      org.apache.spark.sql.types.StringType, 42L)
    (((h % buckets) + buckets) % buckets).toInt
  }

  /** Append the page-bucket column. */
  def withPageBucket(df: org.apache.spark.sql.DataFrame, buckets: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("pb", pmod(xxhash64(col("url")), lit(buckets)).cast("int"))
  }

  /** Write a pages table bucket-partitioned by `pb` plus its
    * `_corpus_meta` row. The pre-write repartition by pb keeps the file
    * count at ~1 per bucket instead of tasks × buckets (the same
    * small-files shape as the index dim writes). */
  def writeBucketed(store: graft.store.TableStore, pages: org.apache.spark.sql.DataFrame,
      buckets: Int = DefaultPageBuckets): Unit = {
    import org.apache.spark.sql.functions._
    val spark = pages.sparkSession
    store.replace(
      withPageBucket(pages, buckets).repartition(buckets, col("pb")),
      "", partitionBy = Seq("pb"))
    store.replace(
      spark.range(1).select(lit(buckets).as("page_buckets")), MetaTable)
  }

  /** The persisted page-bucket count of a corpus dir, if bucketed. */
  def pageBuckets(store: graft.store.TableStore): Option[Int] =
    try {
      if (store.exists(MetaTable))
        Some(store.read(MetaTable).collect()(0)
          .getAs[Number]("page_buckets").intValue())
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
}

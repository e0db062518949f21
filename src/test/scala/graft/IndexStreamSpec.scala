package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{HtmlText, ReferenceTfSum, RuDict}
import graft.corpus.{CorpusGen, PageRow}
import graft.index.IndexBuild
import graft.queryengine.SearchEngine
import graft.store.TableStore
import graft.streaming.IndexStream

/** Continuous index ingest (IndexStream): a file-source page feed must
  * bootstrap an index from its first micro-batch, fold later files in as
  * refresh deltas (re-crawled url ⇒ old version replaced), and be visible
  * to a LIVE engine through the fingerprint auto-reload — without
  * restarting either the stream or the engine. */
class IndexStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def html(title: String, body: String): Array[Byte] =
    s"<html><head><title>$title</title></head><body><p>$body</p></body></html>"
      .getBytes(StandardCharsets.UTF_8)

  private def page(url: String, h: Array[Byte], tsOffset: Long = 0L): PageRow =
    PageRow(url, new java.sql.Timestamp(CorpusGen.Epoch + tsOffset), h,
      HtmlText.cleanToText(new String(h, StandardCharsets.UTF_8)), "ru")

  test("page feed: bootstrap build, incremental re-crawl refresh, live-engine visibility") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val work = Files.createTempDirectory("graft-stream-idx").toString
    val feed = s"$work/feed"
    val idx = s"$work/idx"
    val cfg = IndexBuild.Config(shards = 4, saltThresholdDf = 60L, buckets = 16)

    val l = RuDict.contentLemmas
    val markerOld = l(190)
    val markerNew = l(195)
    val crawlUrl = "https://site0.test/p/recrawl"

    // file 1: a small generated corpus + one crafted page (v1: markerOld)
    val base = CorpusGen.generate(spark, CorpusGen.Config(2, 30)).collect().toSeq
    val v1 = page(crawlUrl, html("первая версия",
      s"$markerOld ${RuDict.formsOf(markerOld)(1)} ${l(2)}"))
    spark.createDataset(base :+ v1).write.mode("append").parquet(feed)

    val q = IndexStream.run(spark, feed, idx, cfg)
    try {
      q.processAllAvailable()
      val store = TableStore.open(spark, idx)
      val nAfterBoot = store.read("stats").collect()(0).getAs[Long]("n_docs")
      assert(nAfterBoot == base.size + 1L,
        s"bootstrap batch must index every feed page (got $nAfterBoot)")

      // live engine on the bootstrapped index
      val engine = new SearchEngine(spark, idx, feed, ReferenceTfSum)
      assert(engine.search(markerOld, 0, 30, None).data
        .exists(i => i.site + i.uri == crawlUrl), "v1 content must be searchable")

      // file 2: the same url RE-CRAWLED (v2: markerNew only), a new page,
      // and a url crawled TWICE within the same micro-batch (two
      // warc_ts versions — ingest must keep only the later one)
      val v2 = page(crawlUrl, html("вторая версия",
        s"$markerNew ${RuDict.formsOf(markerNew)(2)} ${l(3)}"))
      val fresh = page("https://site1.test/p/fresh", html("новая",
        s"${l(4)} ${l(5)} ${l(4)}"))
      val dupUrl = "https://site0.test/p/dup"
      val markerDupOld = l(185)
      val markerDupNew = l(187)
      val dupA = page(dupUrl, html("дубль старый", s"$markerDupOld ${l(6)}"))
      val dupB = page(dupUrl, html("дубль новый", s"$markerDupNew ${l(6)}"),
        tsOffset = 60000L)
      spark.createDataset(Seq(v2, fresh, dupA, dupB)).write.mode("append").parquet(feed)
      q.processAllAvailable()

      val nAfterDelta = store.read("stats").collect()(0).getAs[Long]("n_docs")
      assert(nAfterDelta == base.size + 3L,
        s"re-crawl must replace, new urls must add once (got $nAfterDelta)")
      // in-batch dedup: only the later warc_ts version of dupUrl indexed
      assert(engine.search(markerDupNew, 0, 30, None).data
        .exists(i => i.site + i.uri == dupUrl), "later duplicate version must win")
      assert(!engine.search(markerDupOld, 0, 30, None).data
        .exists(i => i.site + i.uri == dupUrl), "earlier duplicate version must lose")

      // SAME engine instance: fingerprint reload must expose the delta
      assert(engine.search(markerNew, 0, 30, None).data
        .exists(i => i.site + i.uri == crawlUrl), "v2 content must be searchable live")
      assert(!engine.search(markerOld, 0, 30, None).data
        .exists(i => i.site + i.uri == crawlUrl),
        "v1 content of the re-crawled page must be gone")

      // the ingest committed through the lineage protocol: a refresh
      // lineage row with real delta metrics exists beyond the bootstrap
      val lineage = store.read("lineage")
        .filter($"doc_range".startsWith("refresh"))
        .select("term_count", "posting_count").as[(Long, Long)].collect()
      assert(lineage.nonEmpty && lineage.forall { case (t, p) => t > 0 && p > 0 },
        "refresh micro-batches must commit lineage rows with real metrics")
    } finally q.stop()
  }
}

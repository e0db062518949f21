package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen

/** The bench's reduced-tier down-shift must be CHEAP in exactly the
  * windows where it fires (host contended, budget nearly gone), so the
  * 100k corpus is carved from the already-generated full corpus as a
  * deterministic subset — Bench.pageSubsetFilter — not regenerated (a
  * CorpusGen run cost ~327 s in the round-5 driver window and starved
  * the down-shift). This spec pins the subset's two load-bearing
  * properties at miniature scale: EXACT size (count feeds the docs/sec
  * denominator) and per-site balance (the index shards are site-routed;
  * an unbalanced subset would bench a skew the full tier doesn't have). */
class BenchSubsetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pageSubsetFilter keeps exactly pagesPerSite/step pages per site") {
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("graft-subset").toString
    // same layout as the bench corpus (4 sites, /p/NNNNNN urls), 1/1000 size
    val pages = CorpusGen.generate(spark, CorpusGen.Config(nSites = 4, pagesPerSite = 100))
    pages.write.mode("overwrite").parquet(s"$work/pages")

    val step = 4 // the 400k -> 100k default down-shift ratio
    val sub = spark.read.parquet(s"$work/pages").filter(Bench.pageSubsetFilter(step))
    val perSite = sub
      .groupBy(regexp_extract(col("url"), "https://(site\\d+)\\.test", 1).as("site"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(perSite.values.sum == 100, s"4 sites x 100/4 pages expected, got $perSite")
    assert(perSite.size == 4 && perSite.values.forall(_ == 25),
      s"subset must stay site-balanced, got $perSite")

    // determinism: the same filter over the same corpus selects the same urls
    val urls1 = sub.select("url").collect().map(_.getString(0)).sorted.toSeq
    val urls2 = spark.read.parquet(s"$work/pages").filter(Bench.pageSubsetFilter(step))
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(urls1 == urls2)
    // and it is the arithmetic subset, not an arbitrary quarter
    assert(urls1.forall(_.takeRight(6).toLong % step == 0))
  }

  test("pageSubsetFilter keys on the full page number past the %06d width") {
    // CorpusGen's /p/%06d widens to 7 digits at n >= 10^6; a fixed
    // last-6-chars slice would read n mod 10^6 there and silently break
    // the exact-count invariant (step 48 does not divide 10^6). The
    // filter must select by the FULL trailing number at any width.
    import spark.implicits._
    val ns = (999990L to 1000010L) ++ Seq(0L, 48L, 999999L)
    val df = ns.map(n => f"https://site0.test/p/$n%06d").toDF("url")
    val step = 48
    val kept = df.filter(Bench.pageSubsetFilter(step))
      .collect().map(_.getString(0)).toSet
    val expected = ns.filter(_ % step == 0)
      .map(n => f"https://site0.test/p/$n%06d").toSet
    assert(kept == expected, s"kept=$kept expected=$expected")
  }
}

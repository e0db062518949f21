package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.{CorpusGen, PageRow}
import graft.index.IndexBuild

/** One isolated index-build throughput measurement — run in a FRESH JVM
  * per parallelism level (Bench spawns it as a subprocess). A shared JVM
  * measurably degrades later sessions (heap/GC accumulation skewed
  * repeated in-process runs by up to 2x), so each level gets a clean
  * heap, its own small JIT warm-up build, then the timed run.
  *
  * args: <threads> <pagesPath> <outDir> <nDocs> <saltThreshold>
  * stdout: one line `BENCHBUILD_RESULT <docsPerSec>`
  */
object BenchBuild {
  def main(args: Array[String]): Unit = {
    val Array(threadsS, pagesPath, outDir, nDocsS, saltS) = args
    val threads = threadsS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-benchbuild-$threads")
      // FIXED shuffle width across parallelism levels: a cluster scaling
      // N→4N keeps its partition count and raises concurrency; tying the
      // width to the thread count makes the low-parallelism run sort the
      // whole posting set in one spilling partition and measures disk,
      // not scaling.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", s"/dev/shm/graft-bench-shuffle-$threads")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val idxCfg = IndexBuild.Config(shards = 8, saltThresholdDf = saltS.toLong,
        nBatches = 1, buckets = 16)
      // JIT warm-up: small untimed build
      val warmCfg = CorpusGen.Config(nSites = 2, pagesPerSite = 2500)
      CorpusGen.generate(spark, warmCfg).write.mode("overwrite").parquet(s"$outDir/warm_pages")
      val wp = spark.read.parquet(s"$outDir/warm_pages")
        .as[PageRow](org.apache.spark.sql.Encoders.product[PageRow])
      IndexBuild.run(spark, wp, s"$outDir/warm_idx", idxCfg)

      val pages = spark.read.parquet(pagesPath)
        .as[PageRow](org.apache.spark.sql.Encoders.product[PageRow])
      val t0 = System.nanoTime()
      IndexBuild.run(spark, pages, s"$outDir/idx", idxCfg)
      IndexBuild.mergeSegments(spark, s"$outDir/idx")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BENCHBUILD_RESULT ${nDocsS.toLong / sec}%.1f")
    } finally spark.stop()
  }
}

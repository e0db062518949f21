package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-bisection probe for the analyze phase (diagnostic tool, not a
  * driver contract): times each candidate bottleneck of the index build's
  * first stage separately at the given thread count, so a scaling
  * regression can be attributed to the scan, the kernels, or the cache.
  *
  * args: <threads> <pagesPath> <mode>
  *   mode = scan | kernel | persist | html | lemma
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val Array(threadsS, pagesPath, mode) = args
    val threads = threadsS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-probe-$threads-$mode")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", s"/dev/shm/graft-probe-$threads")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      def base = spark.read.parquet(pagesPath)
        .select(col("url"), col("html"), col("lang"))
        .as[(String, Array[Byte], String)]

      def analyzedDf = base.map { case (url, html, lang) =>
        val text = graft.core.HtmlText.cleanToTextFast(html)
        val counts = graft.core.Lemmatizer.lemmaCountsFast(text)
        (graft.index.IndexBuild.stableDocId(url), url,
          graft.index.IndexBuild.siteOf(url), lang,
          counts.valuesIterator.sum.toLong,
          counts.map { case (k, v) => k -> v.toLong })
      }.toDF("doc_id", "url", "site", "lang", "dl", "terms")

      def run(): Unit = mode match {
        case "scan" => // parquet scan + decompress only (force html read)
          base.map { case (_, html, _) => html.length.toLong }
            .reduce(_ + _): Unit
        case "html" => // + html-to-text kernel
          base.map { case (_, html, _) =>
            graft.core.HtmlText.cleanToTextFast(html).length.toLong
          }.reduce(_ + _): Unit
        case "lemma" => // + lemmatize kernel (no row/map encoding)
          base.map { case (_, html, _) =>
            val t = graft.core.HtmlText.cleanToTextFast(html)
            graft.core.Lemmatizer.lemmaCountsFast(t).size.toLong
          }.reduce(_ + _): Unit
        case "fused" => // the build's fused byte-scan kernel (no map encoding)
          base.map { case (_, html, _) =>
            graft.core.Lemmatizer.lemmaCountsFromHtml(html).size.toLong
          }.reduce(_ + _): Unit
        case "kernel" => // the full analyze row incl. map-column encoding
          analyzedDf.count(): Unit
        case "persist" => // + MEMORY_AND_DISK cache write (the build's form)
          val d = analyzedDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          d.count()
          d.unpersist(blocking = true): Unit
      }

      run() // warm-up (JIT + page cache)
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE_RESULT mode=$mode threads=$threads $sec%.2f s")
    } finally spark.stop()
  }
}

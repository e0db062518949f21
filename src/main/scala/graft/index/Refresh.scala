package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Lemmatizer, PostingCodec}
import graft.corpus.PageRow

/** Incremental page refresh / delete — the rebuild of the reference's
  * `POST /api/indexPage` (IndexServiceImpl.java:84-115): the reference
  * cascade-deletes the page's postings, decrements lemma dfs and
  * re-inserts (SiteServiceImpl.java:118-141); the immutable Spark design
  * replaces row-level delete+decrement with Iceberg-style EQUALITY
  * DELETES (SURVEY.md §2.1 S6):
  *
  *  - a refresh appends (a) a delta segment batch holding the new
  *    version's postings and (b) a tombstone row (doc_id, as_of_batch)
  *    meaning "postings of doc_id from any batch < as_of_batch are dead";
  *  - the merge applies tombstones while sort-merging (latest batch
  *    wins), writes a fresh `index`, records the high-water batch in
  *    `index_meta`, and derives lemma_stats/stats/docs consistently.
  *
  * The stats rebuild decodes the merged index (one full pass) — correct
  * and simple in-sandbox; at 10^12 docs those aggregates would be
  * maintained incrementally via Iceberg MERGE INTO instead.
  */
object Refresh {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, p: String): Boolean =
    fs(spark).exists(new Path(p))

  /** High-water batch id the current `index` dir is merged up to. */
  def indexAsOf(spark: SparkSession, outDir: String): Int =
    if (!exists(spark, s"$outDir/index_meta")) 0
    else spark.read.parquet(s"$outDir/index_meta").collect()(0).getAs[Int]("as_of_batch")

  private def nextBatch(spark: SparkSession, outDir: String): Int = {
    import spark.implicits._
    val fromLineage =
      try spark.read.parquet(s"$outDir/lineage").agg(max("partition_id"))
        .as[Int].collect().headOption.getOrElse(-1)
      catch { case scala.util.control.NonFatal(_) => -1 }
    math.max(fromLineage, indexAsOf(spark, outDir)) + 1
  }

  /** Re-index (or newly index) the given pages; `delete` additionally
    * removes docs by url without re-adding. Appends a delta batch +
    * tombstones, then re-merges. */
  def refreshPages(spark: SparkSession, outDir: String, pages: Dataset[PageRow],
      cfg: IndexBuild.Config = IndexBuild.Config()): Unit = {
    import spark.implicits._
    val batch = nextBatch(spark, outDir)

    val analyzed = pages.select(col("url"), col("html"), col("lang"))
      .as[(String, Array[Byte], String)]
      .map { case (url, html, lang) =>
        val text = graft.core.HtmlText.cleanToTextFast(html)
        val counts = Lemmatizer.lemmaCountsFast(text)
        (IndexBuild.stableDocId(url), url, IndexBuild.siteOf(url), lang,
          counts.valuesIterator.sum.toLong,
          counts.map { case (k, v) => k -> v.toLong })
      }
      .toDF("doc_id", "url", "site", "lang", "dl", "terms")
      .cache()

    // tombstones FIRST would orphan the old version on a crash before the
    // delta lands; delta-then-tombstone means a crash re-runs the refresh
    // idempotently (same doc_ids, same batch semantics).
    val post = analyzed.select(col("doc_id"),
        explode(col("terms")).as(Seq("term", "tf")), col("dl"))
      .select("term", "doc_id", "tf", "dl").as[PostingRow]
    val headDf =
      if (exists(spark, s"$outDir/head_terms")) spark.read.parquet(s"$outDir/head_terms")
      else Seq.empty[String].toDF("term")
    IndexBuild.buildSegments(post, headDf, cfg, spark.sparkContext.defaultParallelism)
      .toDF.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$outDir/segments/batch=$batch")

    analyzed.select(col("doc_id"), lit(batch).as("as_of_batch"))
      .write.mode(SaveMode.Append).parquet(s"$outDir/tombstones")

    // refresh docs dim: latest row per url wins
    val newDocs = analyzed.select("doc_id", "url", "site", "lang", "dl")
    val oldDocs = spark.read.parquet(s"$outDir/docs")
    val mergedDocs = oldDocs.join(newDocs.select("doc_id"), Seq("doc_id"), "left_anti")
      .union(newDocs)
    writeReplacing(spark, mergedDocs, s"$outDir/docs")

    // lineage commit row for the delta
    val nNew = analyzed.count()
    spark.range(1).select(
      lit(batch).as("partition_id"),
      lit(s"refresh batch $batch").as("doc_range"),
      lit(0L).as("posting_bytes"),
      lit(0L).as("term_count"),
      lit(nNew).as("posting_count"),
      lit("COMPLETE").as("status"),
      current_timestamp().as("ts"))
      .write.mode(SaveMode.Append).parquet(s"$outDir/lineage")
    analyzed.unpersist()

    mergeWithTombstones(spark, outDir, cfg)
  }

  /** Delete docs by url (no replacement). */
  def deletePages(spark: SparkSession, outDir: String, urls: Seq[String],
      cfg: IndexBuild.Config = IndexBuild.Config()): Unit = {
    import spark.implicits._
    val batch = nextBatch(spark, outDir)
    urls.map(u => (IndexBuild.stableDocId(u), batch)).toDF("doc_id", "as_of_batch")
      .write.mode(SaveMode.Append).parquet(s"$outDir/tombstones")
    val ids = urls.map(IndexBuild.stableDocId)
    val docs = spark.read.parquet(s"$outDir/docs")
      .filter(!col("doc_id").isin(ids: _*))
    writeReplacing(spark, docs, s"$outDir/docs")
    mergeWithTombstones(spark, outDir, cfg)
  }

  /** Sort-merge base index + delta batches with equality deletes applied
    * (posting alive ⇔ its batch ≥ the doc's max tombstone), then rebuild
    * the derived aggregates so query-time pruning stays exact. */
  def mergeWithTombstones(spark: SparkSession, outDir: String,
      cfg: IndexBuild.Config): Unit = {
    import spark.implicits._
    val asOf = indexAsOf(spark, outDir)

    val tomb: Map[Long, Int] =
      if (!exists(spark, s"$outDir/tombstones")) Map.empty
      else spark.read.parquet(s"$outDir/tombstones")
        .groupBy("doc_id").agg(max("as_of_batch").as("b"))
        .as[(Long, Int)].collect().toMap
    val tombB = spark.sparkContext.broadcast(tomb)

    val base = spark.read.parquet(s"$outDir/index")
      .select(lit(asOf).as("batch"), col("bucket"), col("term"), col("shard"), col("postings"))
    val deltas =
      if (!exists(spark, s"$outDir/segments")) base.limit(0)
      else spark.read.parquet(s"$outDir/segments")
        .filter(col("batch") > asOf)
        .select(col("batch"), col("bucket"), col("term"), col("shard"), col("postings"))
    val maxBatch = nextBatch(spark, outDir) - 1

    val merged = base.union(deltas)
      .as[(Int, Int, String, Int, Array[Byte])]
      .groupByKey { case (_, bucket, term, shard, _) => (bucket, term, shard) }
      .mapGroups { (key: (Int, String, Int), rows: Iterator[(Int, Int, String, Int, Array[Byte])]) =>
        val (bucket, term, shard) = key
        val t = tombB.value
        val alive = rows.toSeq.flatMap { case (batch, _, _, _, bytes) =>
          PostingCodec.decode(bytes).filter(p => t.getOrElse(p.docId, Int.MinValue) <= batch)
        }.sortBy(_.docId).toArray
        SegmentRow(bucket, term, shard, 0, alive.length,
          if (alive.isEmpty) 0.0 else alive.map(_.tf).max.toDouble,
          PostingCodec.encode(alive))
      }
      .filter(_.doc_count > 0)

    // write-aside then swap (can't overwrite a dir being read)
    merged.toDF.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$outDir/index_new")
    val f = fs(spark)
    f.delete(new Path(s"$outDir/index"), true)
    f.rename(new Path(s"$outDir/index_new"), new Path(s"$outDir/index"))
    spark.catalog.refreshByPath(s"$outDir/index")
    spark.range(1).select(lit(maxBatch).as("as_of_batch"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/index_meta")

    // rebuild derived aggregates from the merged index (exact df for the
    // 80% pruning rule) — scale note in the object scaladoc
    val docsDim = spark.read.parquet(s"$outDir/docs")
    val postAll = spark.read.parquet(s"$outDir/index")
      .select("term", "postings").as[(String, Array[Byte])]
      .flatMap { case (term, bytes) =>
        PostingCodec.decode(bytes).iterator.map(p => (term, p.docId, p.dl))
      }
      .toDF("term", "doc_id", "dl")
    writeReplacing(spark,
      postAll.join(docsDim.select("doc_id", "site"), Seq("doc_id"))
        .groupBy("term", "site").agg(count(lit(1)).as("df")),
      s"$outDir/lemma_stats")
    val shards = spark.read.parquet(s"$outDir/stats").collect()(0).getAs[Int]("shards")
    writeReplacing(spark,
      docsDim.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("doc_id")).as("n_distinct"),
        avg(col("dl")).as("avgdl"),
        sum(col("dl")).as("total_tokens"))
        .withColumn("shards", lit(shards)),
      s"$outDir/stats")
  }

  /** Overwrite a parquet dir that is also the read source: write aside,
    * delete, rename, and invalidate the session's plan/file-listing caches
    * for the path — a previously built SearchEngine has these paths
    * `.cache()`d and would otherwise keep serving the pre-refresh data. */
  private def writeReplacing(spark: SparkSession, df: DataFrame, path: String): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(s"$path.__new")
    val f = fs(spark)
    f.delete(new Path(path), true)
    f.rename(new Path(s"$path.__new"), new Path(path))
    spark.catalog.refreshByPath(path)
  }
}

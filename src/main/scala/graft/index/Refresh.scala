package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Lemmatizer, PostingCodec}
import graft.corpus.PageRow
import graft.store.TableStore

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

  /** High-water batch id the current `index` dir is merged up to. */
  def indexAsOf(spark: SparkSession, outDir: String): Int = {
    val store = TableStore.open(spark, outDir)
    if (!store.exists("index_meta")) 0
    else store.read("index_meta").collect()(0).getAs[Int]("as_of_batch")
  }

  private def nextBatch(spark: SparkSession, outDir: String): Int = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val fromLineage =
      try store.read("lineage").agg(max("partition_id"))
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
    val store = TableStore.open(spark, outDir)
    val batch = nextBatch(spark, outDir)

    val analyzed = IndexBuild.filterValidCode(pages) // F1, as in the build
      .select(col("url"), col("html"), col("lang"))
      .as[(String, Array[Byte], String)]
      .map { case (url, html, lang) =>
        val counts = Lemmatizer.lemmaCountsFromHtml(html)
        (IndexBuild.stableDocId(url), url, IndexBuild.siteOf(url), lang,
          counts.valuesIterator.sum, counts)
      }
      .toDF("doc_id", "url", "site", "lang", "dl", "terms")
      .cache()

    // tombstones FIRST would orphan the old version on a crash before the
    // delta lands; delta-then-tombstone means a crash re-runs the refresh
    // idempotently (same doc_ids, same batch semantics).
    val post = analyzed.select(col("doc_id"), col("site"), col("dl"),
        explode(col("terms")).as(Seq("term", "tf")))
      .select("term", "doc_id", "tf", "dl", "site")
    val headDf = store.readOpt("head_terms")
      .getOrElse(Seq.empty[String].toDF("term"))
    store.write(
      IndexBuild.buildSegments(post, headDf, cfg,
        spark.sparkContext.defaultParallelism).toDF,
      s"segments/batch=$batch", SaveMode.Overwrite, partitionBy = Seq("bucket"))

    store.write(analyzed.select(col("doc_id"), lit(batch).as("as_of_batch")),
      "tombstones", SaveMode.Append)

    // touched terms = OLD version's terms (from the forward doc_terms
    // table — names the buckets holding the postings to tombstone) ∪ NEW
    // version's terms. Materialized BEFORE doc_terms is replaced below.
    val newIds = analyzed.select("doc_id")
    val hadForward = store.exists("doc_terms")
    // localCheckpoint (NOT persist): the doc_terms/docs tables are
    // REPLACED below, and a replace invalidates+recomputes any cached
    // plan that references the table — a lineage-cut snapshot is the only
    // value that survives its source's replacement
    val touched = (store.readOpt("doc_terms") match {
      case Some(dt) => dt.join(newIds, Seq("doc_id"))
        .select(explode(col("terms")).as("term"))
      case None => analyzed.limit(0).select(lit("").as("term"))
    }).union(analyzed.select(explode(map_keys(col("terms"))).as("term")))
      .distinct()
      .localCheckpoint(true)

    // refresh docs dim: latest row per url wins
    val newDocs = analyzed.select("doc_id", "url", "site", "lang", "dl")
    val oldDocs = store.read("docs")
    val mergedDocs = oldDocs.join(newIds, Seq("doc_id"), "left_anti")
      .union(newDocs)
    store.replace(mergedDocs, "docs")

    // forward index follows the docs dim: latest version's term set wins.
    // An index that PREDATES doc_terms keeps none (a partial forward
    // table would silently break later pruned compactions) — such an
    // index always takes the full-merge path below.
    if (hadForward) {
      val newDocTerms = analyzed.select(col("doc_id"), map_keys(col("terms")).as("terms"))
      store.replace(
        store.read("doc_terms").join(newIds, Seq("doc_id"), "left_anti")
          .union(newDocTerms), "doc_terms")
    }

    // lineage commit row for the delta — REAL metrics (north_star: per-
    // partition lineage carries posting bytes + term count): bytes from
    // the store, term/posting counts from one small agg over the cached
    // analyze output (term_count = distinct terms in the delta,
    // posting_count = Σ per-doc distinct terms = delta posting rows)
    val deltaAgg = analyzed
      .select(explode(map_keys(col("terms"))).as("term"))
      .agg(countDistinct(col("term")).as("term_count"),
        count(lit(1)).as("posting_count"))
      .collect()(0)
    store.write(spark.range(1).select(
      lit(batch).as("partition_id"),
      lit(s"refresh batch $batch").as("doc_range"),
      lit(store.sizeInBytes(s"segments/batch=$batch")).as("posting_bytes"),
      lit(deltaAgg.getAs[Long]("term_count")).as("term_count"),
      lit(deltaAgg.getAs[Long]("posting_count")).as("posting_count"),
      lit("COMPLETE").as("status"),
      lit(null).cast("string").as("error"),
      current_timestamp().as("ts")),
      "lineage", SaveMode.Append)
    // per-site lifecycle: stamp the refreshed sites' status_time (the
    // reference's updateStatusOnSite path, SiteServiceImpl.java:83-91)
    store.write(
      analyzed.select("site").distinct()
        .select(col("site"), lit(IndexBuild.SiteStatus.Indexed).as("status"),
          lit(null).cast("string").as("error"), current_timestamp().as("ts")),
      "site_status", SaveMode.Append)
    analyzed.unpersist()

    if (hadForward) compactTouched(spark, outDir, cfg, touched)
    else mergeWithTombstones(spark, outDir, cfg)
  }

  /** Delete docs by url (no replacement). */
  def deletePages(spark: SparkSession, outDir: String, urls: Seq[String],
      cfg: IndexBuild.Config = IndexBuild.Config()): Unit = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val batch = nextBatch(spark, outDir)
    val idsDf = urls.map(IndexBuild.stableDocId).toDF("doc_id")
    val hadForward = store.exists("doc_terms")
    // the deleted docs' terms (forward lookup) name the buckets to
    // compact; lineage-cut snapshot — doc_terms is replaced below
    val touched = (store.readOpt("doc_terms") match {
      case Some(dt) => dt.join(idsDf, Seq("doc_id"))
        .select(explode(col("terms")).as("term")).distinct()
      case None => Seq.empty[String].toDF("term")
    }).localCheckpoint(true)
    store.write(
      urls.map(u => (IndexBuild.stableDocId(u), batch)).toDF("doc_id", "as_of_batch"),
      "tombstones", SaveMode.Append)
    // lineage commit row for the delete: keeps the high-water batch
    // accounting symmetric with refreshPages (nextBatch derives from
    // max(lineage, index_meta) — a delete without a lineage row would
    // leave index_meta one below its tombstone batch) and records the
    // touched-term metric for the audit trail
    store.write(spark.range(1).select(
      lit(batch).as("partition_id"),
      lit(s"delete batch $batch (${urls.size} urls)").as("doc_range"),
      lit(0L).as("posting_bytes"),
      lit(touched.count()).as("term_count"),
      lit(0L).as("posting_count"),
      lit("COMPLETE").as("status"),
      lit(null).cast("string").as("error"),
      current_timestamp().as("ts")),
      "lineage", SaveMode.Append)
    store.replace(
      store.read("docs").join(idsDf, Seq("doc_id"), "left_anti"), "docs")
    if (hadForward)
      store.replace(
        store.read("doc_terms").join(idsDf, Seq("doc_id"), "left_anti"), "doc_terms")
    if (hadForward) compactTouched(spark, outDir, cfg, touched)
    else mergeWithTombstones(spark, outDir, cfg)
  }

  /** Sort-merge base index + delta batches with equality deletes applied
    * (posting alive ⇔ its batch ≥ the doc's max tombstone), then rebuild
    * the derived aggregates so query-time pruning stays exact.
    *
    * Fully distributed: tombstones are joined as a TABLE (Spark picks
    * broadcast-hash for a small tombstone set, sort-merge for a huge one —
    * no driver-side collection either way), and lemma_stats derives from
    * the SAME decoded pass that feeds the re-encode (persisted once), so
    * the index is decoded exactly once per merge. The Iceberg production
    * mapping is MERGE INTO with equality-delete files + a compaction job;
    * this is that compaction expressed over parquet. */
  def mergeWithTombstones(spark: SparkSession, outDir: String,
      cfg: IndexBuild.Config): Unit = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val asOf = indexAsOf(spark, outDir)

    val tombDf = store.readOpt("tombstones")
      .map(_.groupBy("doc_id").agg(max("as_of_batch").as("tomb_batch")))
      .getOrElse(Seq.empty[(Long, Int)].toDF("doc_id", "tomb_batch"))

    val base = store.read("index")
      .select(lit(asOf).as("batch"), col("term"), col("shard"), col("postings"))
    val deltas = store.readOpt("segments")
      .map(_.filter(col("batch") > asOf)
        .select(col("batch"), col("term"), col("shard"), col("postings")))
      .getOrElse(base.limit(0))
    val maxBatch = nextBatch(spark, outDir) - 1

    // ONE decode pass; alive rows feed both the re-encode and lemma_stats
    val exploded = base.union(deltas)
      .as[(Int, String, Int, Array[Byte])]
      .flatMap { case (batch, term, shard, bytes) =>
        PostingCodec.decode(bytes).iterator.map(p =>
          (batch, term, shard, p.docId, p.tf, p.dl))
      }
      .toDF("batch", "term", "shard", "doc_id", "tf", "dl")
    // lineage-cut snapshot (not persist): alive is read again for the
    // lemma_stats rebuild AFTER `index` — its source — is replaced; a
    // cached plan would be invalidated and recomputed over the new table
    val alive = exploded
      .join(tombDf, Seq("doc_id"), "left")
      .filter(col("tomb_batch").isNull || col("tomb_batch") <= col("batch"))
      .select("term", "shard", "doc_id", "tf", "dl")
      .localCheckpoint(true)

    val numPartitions = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val merged = IndexBuild.encodeSortedRows(
      alive
        .repartition(numPartitions, col("term"), col("shard"))
        .sortWithinPartitions("term", "shard", "doc_id"),
      cfg.buckets)

    // atomic replace (parquet: write-aside + swap; iceberg: RTAS commit)
    store.replace(merged.toDF, "index", partitionBy = Seq("bucket"))
    store.write(spark.range(1).select(lit(maxBatch).as("as_of_batch")),
      "index_meta", SaveMode.Overwrite)

    // derived aggregates from the SAME alive rows (exact df for the 80%
    // pruning rule) — no second decode of the merged index
    val docsDim = store.read("docs")
    store.replace(
      alive.join(docsDim.select("doc_id", "site"), Seq("doc_id"))
        .groupBy("term", "site").agg(count(lit(1)).as("df")),
      "lemma_stats")
    rebuildStats(spark, store, docsDim, cfg)
  }

  /** corpus-level stats (N, avgdl) from the docs dim — exact after any
    * refresh/delete because docs is replaced latest-version-wins. */
  private def rebuildStats(spark: SparkSession, store: TableStore,
      docsDim: DataFrame, cfg: IndexBuild.Config): Unit = {
    val prevStats = store.read("stats").collect()(0)
    val shards = prevStats.getAs[Int]("shards")
    def carried(name: String, dflt: Int): Int = // older indexes predate the column
      try prevStats.getAs[Int](name) catch { case _: Exception => dflt }
    store.replace(
      docsDim.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("doc_id")).as("n_distinct"),
        avg(col("dl")).as("avgdl"),
        sum(col("dl")).as("total_tokens"))
        .withColumn("shards", lit(shards))
        .withColumn("n_batches", lit(carried("n_batches", 1)))
        .withColumn("site_groups", lit(carried("site_groups", cfg.siteGroups)))
        .withColumn("buckets", lit(carried("buckets", cfg.buckets))),
      "stats")
  }

  /** BUCKET-PRUNED compaction — the O(touched), not O(corpus), refresh
    * path. `touchedTerms` (old ∪ new term sets of the refreshed/deleted
    * docs, from the forward doc_terms table) names every term-bucket
    * that can possibly hold an affected posting; only those partitions
    * are decoded, tombstone-filtered, re-encoded and overwritten —
    * untouched bucket partitions keep their files byte-identical.
    *
    * Granularity note: pruning is per storage partition (`bucket`), so
    * its selectivity is buckets ÷ distinct-terms-per-doc — production
    * sizes `buckets` with the corpus (thousands of partitions at 10^12
    * docs, like Iceberg partition counts), making a one-page refresh
    * touch a few permille of the index. The in-sandbox default of 16
    * exists only to keep tiny test indexes from fragmenting.
    *
    * Derived aggregates stay EXACT: lemma_stats rows for touched terms
    * are recomputed from the rewritten buckets' alive postings and
    * spliced against the untouched rows; stats rebuild from the docs
    * dim. Crash recovery: tombstones and delta batches are retained, so
    * re-running the refresh (or a full mergeWithTombstones) after a
    * crash mid-overwrite converges to the same state — the Iceberg
    * production mapping makes the partition overwrite a single atomic
    * commit instead. */
  def compactTouched(spark: SparkSession, outDir: String,
      cfg: IndexBuild.Config, touchedTerms: DataFrame): Unit = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val asOf = indexAsOf(spark, outDir)
    val maxBatch = nextBatch(spark, outDir) - 1

    val buckets: Seq[Int] = touchedTerms
      .select(pmod(xxhash64(col("term")), lit(cfg.buckets)).cast("int").as("bucket"))
      .distinct().as[Int].collect().toSeq
    if (buckets.isEmpty) { // nothing indexed was touched (empty page)
      store.write(spark.range(1).select(lit(maxBatch).as("as_of_batch")),
        "index_meta", SaveMode.Overwrite)
      rebuildStats(spark, store, store.read("docs"), cfg)
      return
    }

    val tombDf = store.readOpt("tombstones")
      .map(_.groupBy("doc_id").agg(max("as_of_batch").as("tomb_batch")))
      .getOrElse(Seq.empty[(Long, Int)].toDF("doc_id", "tomb_batch"))

    val base = store.read("index")
      .filter(col("bucket").isin(buckets: _*))
      .select(lit(asOf).as("batch"), col("term"), col("shard"), col("postings"))
    val deltas = store.readOpt("segments")
      .map(_.filter(col("batch") > asOf && col("bucket").isin(buckets: _*))
        .select(col("batch"), col("term"), col("shard"), col("postings")))
      .getOrElse(base.limit(0))

    val exploded = base.union(deltas)
      .as[(Int, String, Int, Array[Byte])]
      .flatMap { case (batch, term, shard, bytes) =>
        PostingCodec.decode(bytes).iterator.map(p =>
          (batch, term, shard, p.docId, p.tf, p.dl))
      }
      .toDF("batch", "term", "shard", "doc_id", "tf", "dl")
    // lineage-cut snapshot: alive feeds the lemma_stats recompute AFTER
    // the index partitions it was derived from are overwritten
    val alive = exploded
      .join(tombDf, Seq("doc_id"), "left")
      .filter(col("tomb_batch").isNull || col("tomb_batch") <= col("batch"))
      .select("term", "shard", "doc_id", "tf", "dl")
      .localCheckpoint(true)

    val numPartitions = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val merged = IndexBuild.encodeSortedRows(
      alive
        .repartition(numPartitions, col("term"), col("shard"))
        .sortWithinPartitions("term", "shard", "doc_id"),
      cfg.buckets)

    // overwrite ONLY the touched partitions; a bucket whose postings all
    // died produces no rows — dynamic overwrite won't touch it, so its
    // stale partition dir is dropped explicitly
    store.overwritePartitions(merged.toDF, "index", Seq("bucket"))
    val aliveBuckets = alive
      .select(pmod(xxhash64(col("term")), lit(cfg.buckets)).cast("int").as("bucket"))
      .distinct().as[Int].collect().toSet
    (buckets.toSet -- aliveBuckets).foreach(b => store.drop(s"index/bucket=$b"))
    store.write(spark.range(1).select(lit(maxBatch).as("as_of_batch")),
      "index_meta", SaveMode.Overwrite)

    // lemma_stats: recompute rows of TOUCHED terms from the alive rows,
    // keep every other row as-is (exact df for pruning/ordering)
    val docsDim = store.read("docs")
    val recomputed = alive
      .join(touchedTerms, Seq("term"), "leftsemi")
      .join(docsDim.select("doc_id", "site"), Seq("doc_id"))
      .groupBy("term", "site").agg(count(lit(1)).as("df"))
    val untouchedRows = store.read("lemma_stats")
      .join(touchedTerms, Seq("term"), "left_anti")
    store.replace(untouchedRows.unionByName(recomputed), "lemma_stats")

    rebuildStats(spark, store, docsDim, cfg)
  }

}

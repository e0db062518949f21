package graft.index

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
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
  *  - EVERY table the refresh maintains is O(touched), not O(corpus):
  *    docs/doc_terms are bucket-partitioned by doc id (`db`) and only the
  *    partitions holding the affected ids are rewritten; lemma_stats is
  *    bucket-partitioned by term and updated by an exact ±df delta over
  *    the touched term buckets; corpus stats (n_docs/avgdl/total_tokens)
  *    are adjusted from the delta itself — never re-aggregated;
  *  - compaction (tombstone application + re-encode) is bucket-pruned via
  *    the per-batch `touched_log`, and may be DEFERRED across several
  *    refresh batches (`compact = false`): the index lags at its old
  *    as_of while queries overlay the pending delta batches
  *    (SearchEngine's delta-overlay read path), and a later compaction
  *    folds all pending batches in one bucket-pruned pass — the shape
  *    sustained streaming ingest needs (IndexStream.compactEvery).
  *
  * The Iceberg production mapping is MERGE INTO + equality-delete files;
  * `compactTouched` is that table's compaction expressed over parquet.
  */
object Refresh {

  /** Disambiguates a delete's dim-delta snapshot key from a refresh's
    * over the same doc_ids (see the delete path's key comment). */
  private val DeleteKeySalt = 0x64656c6574655f21L // "delete_!"

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

  /** Delta batches committed but not yet folded into `index` (refreshes
    * ran with compact = false). */
  def pendingBatches(spark: SparkSession, outDir: String): Int =
    math.max(0, nextBatch(spark, outDir) - 1 - indexAsOf(spark, outDir))

  /** The index's PERSISTED layout (stats row: buckets / shards /
    * site_groups / n_batches), authoritative over whatever Config the
    * caller passed — a CLI refresh with the default cfg against an index
    * built with buckets=32 would otherwise hash deltas, touched_log rows
    * and lemma_stats partitions mod 16 while the base tables use mod 32,
    * silently corrupting the overlay/compaction bucket math. Non-layout
    * knobs (saltThresholdDf) stay the caller's. A stats row predating a
    * column falls back to the caller's value for that field only. */
  private[graft] def layoutCfg(store: TableStore,
      cfg: IndexBuild.Config): IndexBuild.Config =
    store.readOpt("stats").map { df =>
      val r = df.collect()(0)
      def get(k: String, d: Int): Int =
        try r.getAs[Int](k) catch { case scala.util.control.NonFatal(_) => d }
      val shards = get("shards", cfg.shards)
      // joint fallback: a stats row that carries shards but predates the
      // site_groups column must not mix persisted shards with the
      // caller's siteGroups — Config requires shards % siteGroups == 0,
      // and e.g. shards=6 with a caller default of 4 would throw and
      // brick every refresh/delete/compaction on that index. When the
      // caller's value doesn't divide the persisted shards, fall back to
      // 1 (always valid; pre-site_groups indexes had no site routing).
      val siteGroups = get("site_groups",
        if (shards % cfg.siteGroups == 0) cfg.siteGroups else 1)
      cfg.copy(
        shards = shards,
        nBatches = get("n_batches", cfg.nBatches),
        siteGroups = siteGroups,
        buckets = get("buckets", cfg.buckets))
    }.getOrElse(cfg)

  /** The O(touched) paths need the forward doc_terms table AND the
    * bucket-partitioned dims (docs.db, lemma_stats.bucket) — all written
    * by current builds. An index predating any of them takes the legacy
    * full-merge path below (which also UPGRADES the dims it rewrites, so
    * one legacy refresh converts the index in place). */
  private[graft] def incrementalLayout(store: TableStore): Boolean =
    store.exists("doc_terms") && store.exists("docs") &&
      store.read("docs").columns.contains("db") &&
      store.read("lemma_stats").columns.contains("bucket")

  /** Re-index (or newly index) the given pages; appends a delta batch +
    * tombstones, maintains every dimension O(touched), then compacts the
    * touched index buckets (or defers it when `compact = false`). */
  def refreshPages(spark: SparkSession, outDir: String, pages: Dataset[PageRow],
      cfg0: IndexBuild.Config = IndexBuild.Config(),
      compact: Boolean = true): Unit = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val cfg = layoutCfg(store, cfg0)
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

    val incremental = incrementalLayout(store)
    val newIds = analyzed.select("doc_id")
    // doc buckets touched by this batch — tiny by construction (≤ batch
    // size, ≤ bucket count); collected to prune the dim partition reads
    val dbs: Seq[Int] =
      if (!incremental) Nil
      else newIds.select(IndexBuild.docBucketCol(cfg.buckets).as("db"))
        .distinct().as[Int].collect().toSeq
    def pruneDb(df: DataFrame): DataFrame =
      if (incremental) df.filter(col("db").isin(dbs: _*)) else df

    // touched terms = OLD version's terms (from the forward doc_terms
    // table, partition-pruned to the touched doc buckets) ∪ NEW version's
    // terms. Materialized BEFORE doc_terms is rewritten below
    // (localCheckpoint = lineage cut, survives its source's replacement).
    val hadForward = store.exists("doc_terms")
    val touched = (store.readOpt("doc_terms") match {
      case Some(dt) => pruneDb(dt).join(newIds, Seq("doc_id"))
        .select(explode(col("terms")).as("term"))
      case None => analyzed.limit(0).select(lit("").as("term"))
    }).union(analyzed.select(explode(map_keys(col("terms"))).as("term")))
      .distinct()
      .localCheckpoint(true)

    // per-batch touched-bucket log: deferred compaction and the engine's
    // delta-overlay read path derive their bucket set from this tiny
    // table (rows with batch > index_meta's as_of are pending)
    val touchedBuckets: Seq[Int] = touched
      .select(IndexBuild.termBucketCol(cfg.buckets).as("bucket"))
      .distinct().as[Int].collect().toSeq.sorted
    store.write(Seq((batch, touchedBuckets)).toDF("batch", "buckets"),
      "touched_log", SaveMode.Append)

    if (incremental) {
      // batch content key + added scalars in ONE agg over the cached
      // analyze output (order-independent hash — drives snapshot reuse
      // on replay, see applyDimDeltas' protocol doc)
      // pmod before the sum: ANSI mode (Spark 4 default) overflows a sum
      // of full-range xxhash64 values; 2^31-1 keys are plenty for a
      // replay-detection content hash
      val addedRow = analyzed.agg(count(lit(1)), sum(col("dl")),
          sum(pmod(xxhash64(col("doc_id")), lit(2147483647L))))
        .as[(Long, Option[Long], Option[Long])].collect()(0)
      val key = addedRow._3.getOrElse(0L)

      if (!dimDeltaKey(store, batch).contains(key)) {
        // old versions of the replaced docs — pruned partition read,
        // snapshotted BEFORE the dims are overwritten; feeds the stats
        // delta and the lemma_stats decrement
        val oldDocs = pruneDb(store.read("docs"))
          .join(newIds, Seq("doc_id"), "leftsemi")
          .select("doc_id", "site", "dl")
          .localCheckpoint(true)
        val oldTermRows = pruneDb(store.read("doc_terms"))
          .join(newIds, Seq("doc_id"), "leftsemi")
          .select(col("doc_id"), explode(col("terms")).as("term"))
          .join(oldDocs.select("doc_id", "site"), Seq("doc_id"))
          .localCheckpoint(true)
        // lemma_stats delta: df(term, site) += new-version counts −
        // old-version counts, over ONLY the touched term buckets (exact —
        // df is a count of distinct docs per (term, site), and each doc
        // contributes one per distinct term, which is precisely what
        // doc_terms stores)
        val plus = analyzed
          .select(col("site"), explode(map_keys(col("terms"))).as("term"))
          .groupBy("term", "site").agg(count(lit(1)).as("d"))
        val minus = oldTermRows.groupBy("term", "site")
          .agg((-count(lit(1))).as("d"))
        val removed = oldDocs.agg(count(lit(1)), sum(col("dl")))
          .as[(Long, Option[Long])].collect()(0)
        persistDimDelta(spark, store, batch, plus.unionByName(minus),
          addedRow._1 - removed._1,
          addedRow._2.getOrElse(0L) - removed._2.getOrElse(0L), key)
      }

      // docs / doc_terms: rewrite ONLY the touched doc buckets
      val newDocs = analyzed.select("doc_id", "url", "site", "lang", "dl")
        .withColumn("db", IndexBuild.docBucketCol(cfg.buckets))
      rewriteDocBuckets(store,
        pruneDb(store.read("docs")).join(newIds, Seq("doc_id"), "left_anti")
          .unionByName(newDocs),
        "docs", dbs)
      val newDocTerms = analyzed
        .select(col("doc_id"), map_keys(col("terms")).as("terms"))
        .withColumn("db", IndexBuild.docBucketCol(cfg.buckets))
      rewriteDocBuckets(store,
        pruneDb(store.read("doc_terms")).join(newIds, Seq("doc_id"), "left_anti")
          .unionByName(newDocTerms),
        "doc_terms", dbs)

      // batch-gated application from the persisted snapshot (idempotent
      // on replay), then snapshot cleanup
      applyDimDeltas(spark, store, batch, cfg)
    } else {
      // legacy layout: full dim rewrites — and the rewrite UPGRADES the
      // dims to the bucket-partitioned layout, so the next refresh on
      // this index is O(touched)
      val newDocs = analyzed.select("doc_id", "url", "site", "lang", "dl")
      val oldDocs = store.read("docs")
        .select("doc_id", "url", "site", "lang", "dl")
      store.replace(
        oldDocs.join(newIds, Seq("doc_id"), "left_anti").unionByName(newDocs)
          .withColumn("db", IndexBuild.docBucketCol(cfg.buckets)),
        "docs", partitionBy = Seq("db"))
      if (hadForward) {
        val newDocTerms = analyzed
          .select(col("doc_id"), map_keys(col("terms")).as("terms"))
        store.replace(
          store.read("doc_terms").select("doc_id", "terms")
            .join(newIds, Seq("doc_id"), "left_anti")
            .unionByName(newDocTerms)
            .withColumn("db", IndexBuild.docBucketCol(cfg.buckets)),
          "doc_terms", partitionBy = Seq("db"))
      }
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

    if (!incremental) mergeWithTombstones(spark, outDir, cfg)
    else if (compact) compactTouched(spark, outDir, cfg)
  }

  /** Delete docs by url (no replacement). */
  def deletePages(spark: SparkSession, outDir: String, urls: Seq[String],
      cfg0: IndexBuild.Config = IndexBuild.Config(),
      compact: Boolean = true): Unit = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val cfg = layoutCfg(store, cfg0)
    val batch = nextBatch(spark, outDir)
    val ids = urls.map(IndexBuild.stableDocId)
    val idsDf = ids.toDF("doc_id")
    val incremental = incrementalLayout(store)
    val dbs: Seq[Int] =
      ids.map(IndexBuild.docBucketOf(_, cfg.buckets)).distinct.sorted
    def pruneDb(df: DataFrame): DataFrame =
      if (incremental) df.filter(col("db").isin(dbs: _*)) else df
    val hadForward = store.exists("doc_terms")
    // the deleted docs' terms (forward lookup, partition-pruned) name the
    // buckets to compact; lineage-cut snapshot — doc_terms is rewritten
    val touched = (store.readOpt("doc_terms") match {
      case Some(dt) => pruneDb(dt).join(idsDf, Seq("doc_id"))
        .select(explode(col("terms")).as("term")).distinct()
      case None => Seq.empty[String].toDF("term")
    }).localCheckpoint(true)
    store.write(
      ids.map(id => (id, batch)).toDF("doc_id", "as_of_batch"),
      "tombstones", SaveMode.Append)
    val touchedBuckets: Seq[Int] = touched
      .select(IndexBuild.termBucketCol(cfg.buckets).as("bucket"))
      .distinct().as[Int].collect().toSeq.sorted
    store.write(Seq((batch, touchedBuckets)).toDF("batch", "buckets"),
      "touched_log", SaveMode.Append)
    if (incremental) {
      // content key: same order-independent hash as refreshPages, over
      // the DELETED ids, XOR an op salt — a crashed refresh of doc set S
      // followed by a delete of the SAME set S reuses the crashed batch
      // id (nextBatch moves only at the lineage row), and without the
      // salt it would key-match the refresh's snapshot and apply the
      // wrong delta (ghost dfs for a deleted doc, n_docs one too high,
      // permanently). The salt makes the two ops' keys disjoint; a
      // replay of the SAME delete still key-matches its own snapshot.
      val key = DeleteKeySalt ^
        idsDf.agg(sum(pmod(xxhash64(col("doc_id")), lit(2147483647L))))
        .as[Option[Long]].collect()(0).getOrElse(0L)
      if (!dimDeltaKey(store, batch).contains(key)) {
        val oldDocs = pruneDb(store.read("docs"))
          .join(idsDf, Seq("doc_id"), "leftsemi")
          .select("doc_id", "site", "dl")
          .localCheckpoint(true)
        val oldTermRows = pruneDb(store.read("doc_terms"))
          .join(idsDf, Seq("doc_id"), "leftsemi")
          .select(col("doc_id"), explode(col("terms")).as("term"))
          .join(oldDocs.select("doc_id", "site"), Seq("doc_id"))
          .localCheckpoint(true)
        val removed = oldDocs.agg(count(lit(1)), sum(col("dl")))
          .as[(Long, Option[Long])].collect()(0)
        persistDimDelta(spark, store, batch,
          oldTermRows.groupBy("term", "site").agg((-count(lit(1))).as("d")),
          -removed._1, -removed._2.getOrElse(0L), key)
      }
      rewriteDocBuckets(store,
        pruneDb(store.read("docs")).join(idsDf, Seq("doc_id"), "left_anti"),
        "docs", dbs)
      rewriteDocBuckets(store,
        pruneDb(store.read("doc_terms")).join(idsDf, Seq("doc_id"), "left_anti"),
        "doc_terms", dbs)
      applyDimDeltas(spark, store, batch, cfg)
    } else {
      store.replace(
        store.read("docs").select("doc_id", "url", "site", "lang", "dl")
          .join(idsDf, Seq("doc_id"), "left_anti")
          .withColumn("db", IndexBuild.docBucketCol(cfg.buckets)),
        "docs", partitionBy = Seq("db"))
      if (hadForward)
        store.replace(
          store.read("doc_terms").select("doc_id", "terms")
            .join(idsDf, Seq("doc_id"), "left_anti")
            .withColumn("db", IndexBuild.docBucketCol(cfg.buckets)),
          "doc_terms", partitionBy = Seq("db"))
    }

    // lineage commit row for the delete — AFTER the dim maintenance (the
    // batch commit point, symmetric with refreshPages: a crash before
    // this line hands the replay the same batch id, which the dim-delta
    // protocol above converges). Keeps the high-water batch accounting
    // right (nextBatch derives from max(lineage, index_meta) — a delete
    // without a lineage row would leave index_meta one below its
    // tombstone batch) and records the touched-term metric.
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

    if (!incremental) mergeWithTombstones(spark, outDir, cfg)
    else if (compact) compactTouched(spark, outDir, cfg)
  }

  /** Rewrite ONLY the given doc-bucket partitions of a dim table with
    * `content` (already restricted to those buckets). `content` is
    * snapshotted (lineage cut) because it reads the partitions it then
    * overwrites; a bucket whose rows all died is dropped explicitly
    * (dynamic overwrite never touches a partition absent from the data). */
  private def rewriteDocBuckets(store: TableStore, content: DataFrame,
      table: String, dbs: Seq[Int]): Unit = {
    val snap = content.localCheckpoint(true)
    store.overwritePartitions(snap, table, Seq("db"))
    val alive = snap.select("db").distinct()
      .as[Int](org.apache.spark.sql.Encoders.scalaInt).collect().toSet
    (dbs.toSet -- alive).foreach(b => store.drop(s"$table/db=$b"))
  }

  /** Apply an exact ±df delta to lemma_stats over only the touched term
    * buckets. `delta` columns: (term, site, d). Rows whose df reaches 0
    * are dropped; buckets whose rows all died are dropped. */
  private def applyLemmaStatsDelta(spark: SparkSession, store: TableStore,
      delta: DataFrame, cfg: IndexBuild.Config): Unit = {
    import spark.implicits._
    val d = delta.groupBy("term", "site").agg(sum(col("d")).as("d"))
      .filter(col("d") =!= 0L)
      .localCheckpoint(true)
    val tbs: Seq[Int] = d
      .select(IndexBuild.termBucketCol(cfg.buckets).as("bucket"))
      .distinct().as[Int].collect().toSeq
    if (tbs.isEmpty) return
    val part = store.read("lemma_stats")
      .filter(col("bucket").isin(tbs: _*))
      .select("term", "site", "df")
    val merged = part
      .join(d, Seq("term", "site"), "full_outer")
      .select(col("term"), col("site"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("d"), lit(0L))).as("df"))
      .filter(col("df") > 0)
      .withColumn("bucket", IndexBuild.termBucketCol(cfg.buckets))
      .localCheckpoint(true)
    store.overwritePartitions(merged, "lemma_stats", Seq("bucket"))
    val alive = merged.select("bucket").distinct().as[Int].collect().toSet
    (tbs.toSet -- alive).foreach(b => store.drop(s"lemma_stats/bucket=$b"))
  }

  /** Adjust corpus stats (n_docs / avgdl / total_tokens) by the refresh
    * delta — one tiny read + one tiny replace, no O(corpus) aggregation.
    * (Uniqueness is enforced at build time; refresh replaces by doc_id,
    * so n_distinct tracks n_docs exactly.) The applied batch is stamped
    * INSIDE the same atomically-replaced row (`stats_as_of`), so a
    * replayed batch can never double-apply this delta. */
  private def applyStatsDelta(spark: SparkSession, store: TableStore,
      dDocs: Long, dTokens: Long, asOfBatch: Int): Unit = {
    val prev = store.read("stats").collect()(0)
    def carried(name: String, dflt: Int): Int =
      try prev.getAs[Int](name) catch { case _: Exception => dflt }
    if (carried("stats_as_of", 0) >= asOfBatch) return
    val n = prev.getAs[Long]("n_docs") + dDocs
    val tt = prev.getAs[Long]("total_tokens") + dTokens
    store.replace(spark.range(1).select(
      lit(n).as("n_docs"),
      lit(n).as("n_distinct"),
      lit(if (n > 0) tt.toDouble / n else 0.0).as("avgdl"),
      lit(tt).as("total_tokens"),
      lit(prev.getAs[Int]("shards")).as("shards"),
      lit(carried("n_batches", 1)).as("n_batches"),
      lit(carried("site_groups", IndexBuild.Config().siteGroups)).as("site_groups"),
      lit(carried("buckets", IndexBuild.Config().buckets)).as("buckets"),
      lit(asOfBatch).as("stats_as_of")),
      "stats")
  }

  /** Highest batch whose lemma_stats delta has been applied (0 when the
    * meta table predates this protocol — every live batch id is ≥ 1). */
  private def lemmaAppliedBatch(store: TableStore): Int =
    store.readOpt("lemma_stats_meta")
      .map(_.collect()(0).getAs[Int]("as_of_batch")).getOrElse(0)

  /** Crash-idempotent dim-delta protocol (refresh AND delete paths).
    *
    * The incremental dim maintenance has an inherent replay hazard: the
    * ±df / ±stats deltas are derived from the OLD dim rows, so once the
    * dims are rewritten a replayed batch recomputes a ZERO delta and the
    * drift is permanent (a term new to the corpus stays df=0 ⇒ its pages
    * unsearchable). Protocol, in order:
    *
    *  1. persistDimDelta — the computed delta rows + stats scalars are
    *     persisted via atomic `replace` BEFORE any dim rewrite, keyed by
    *     a content hash of the batch's doc_ids. A replay of the SAME
    *     batch (IndexStream re-runs its micro-batch; nextBatch hands out
    *     the same id until the lineage row lands) finds the snapshot,
    *     key-matches, and reuses the TRUE delta; a DIFFERENT batch that
    *     was handed a crashed batch's id key-mismatches and recomputes
    *     its own (the crashed batch's drift is then what it was before
    *     this protocol — never worse).
    *  2. dim rewrites (docs / doc_terms) — idempotent by construction
    *     (content derived from current state; a re-rewrite is a no-op).
    *  3. applyDimDeltas — application is GATED per batch:
    *     lemma_stats_meta.as_of_batch for the df delta, stats_as_of
    *     inside the stats row for the corpus delta, so a replay never
    *     double-applies. Remaining non-atomic window: a crash between
    *     the lemma_stats partition-overwrite commit and the meta stamp
    *     re-applies the df delta once on replay (the Iceberg production
    *     mapping folds both into one commit).
    *  4. the caller drops the snapshot, then writes the lineage row —
    *     the batch commit point, after which nextBatch moves on. */
  private def persistDimDelta(spark: SparkSession, store: TableStore,
      batch: Int, deltaRows: DataFrame, dDocs: Long, dTokens: Long,
      key: Long): Unit = {
    store.replace(deltaRows, s"dim_delta_$batch")
    store.replace(spark.range(1).select(
      lit(dDocs).as("d_docs"), lit(dTokens).as("d_tokens"),
      lit(key).as("key")), s"dim_delta_stats_$batch")
  }

  /** The persisted snapshot's content key for `batch`, if complete. */
  private def dimDeltaKey(store: TableStore, batch: Int): Option[Long] =
    if (!store.exists(s"dim_delta_$batch") ||
        !store.exists(s"dim_delta_stats_$batch")) None
    else Some(store.read(s"dim_delta_stats_$batch")
      .collect()(0).getAs[Long]("key"))

  private def applyDimDeltas(spark: SparkSession, store: TableStore,
      batch: Int, cfg: IndexBuild.Config): Unit = {
    if (lemmaAppliedBatch(store) < batch) {
      applyLemmaStatsDelta(spark, store, store.read(s"dim_delta_$batch"), cfg)
      store.replace(spark.range(1).select(lit(batch).as("as_of_batch")),
        "lemma_stats_meta")
    }
    val d = store.read(s"dim_delta_stats_$batch").collect()(0)
    applyStatsDelta(spark, store,
      d.getAs[Long]("d_docs"), d.getAs[Long]("d_tokens"), batch)
    store.drop(s"dim_delta_$batch")
    store.drop(s"dim_delta_stats_$batch")
  }

  /** Decoded, tombstone-filtered posting rows (term, shard, doc_id, tf,
    * dl) of the given index buckets: base segments as-of `asOf` plus
    * every pending delta batch, latest batch winning per doc. The result
    * is lineage-cut (localCheckpoint), so callers may overwrite the
    * tables it read while consuming it — compaction does exactly that,
    * and the engine's delta-overlay read path consumes it read-only. */
  private[graft] def aliveRows(spark: SparkSession, store: TableStore,
      buckets: Seq[Int], asOf: Int): DataFrame = {
    import spark.implicits._
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
    base.union(deltas)
      .as[(Int, String, Int, Array[Byte])]
      .flatMap { case (batch, term, shard, bytes) =>
        PostingCodec.decode(bytes).iterator.map(p =>
          (batch, term, shard, p.docId, p.tf, p.dl))
      }
      .toDF("batch", "term", "shard", "doc_id", "tf", "dl")
      .join(tombDf, Seq("doc_id"), "left")
      .filter(col("tomb_batch").isNull || col("tomb_batch") <= col("batch"))
      .select("term", "shard", "doc_id", "tf", "dl")
      .localCheckpoint(true)
  }

  /** Pending touched buckets: union of touched_log entries newer than the
    * index's as_of — exactly the partitions where `index` is stale. */
  private[graft] def pendingTouchedBuckets(spark: SparkSession,
      store: TableStore, asOf: Int): Seq[Int] = {
    import spark.implicits._
    store.readOpt("touched_log")
      .map(_.filter(col("batch") > asOf)
        .select(explode(col("buckets")).as("b"))
        .distinct().as[Int].collect().toSeq.sorted)
      .getOrElse(Nil)
  }

  /** BUCKET-PRUNED compaction — folds EVERY pending delta batch into the
    * index by rewriting only the term buckets their refreshes touched
    * (from `touched_log`); untouched bucket partitions keep their files
    * byte-identical. Dimensions are NOT touched here — refreshPages/
    * deletePages maintain them incrementally per batch, so a deferred
    * compaction leaves them exact throughout.
    *
    * Granularity note: pruning is per storage partition (`bucket`), so
    * its selectivity is buckets ÷ distinct-terms-per-doc — production
    * sizes `buckets` with the corpus (thousands of partitions at 10^12
    * docs, like Iceberg partition counts), making a one-page refresh
    * touch a few permille of the index. The in-sandbox default of 16
    * exists only to keep tiny test indexes from fragmenting.
    *
    * Crash recovery: tombstones and delta batches are retained until the
    * index_meta bump, so re-running the compaction (or a full
    * mergeWithTombstones) after a crash mid-overwrite converges — the
    * Iceberg production mapping makes the partition overwrite a single
    * atomic commit instead. Spent tombstones (≤ the new as_of) are GC'd
    * after the commit point. */
  def compactTouched(spark: SparkSession, outDir: String,
      cfg0: IndexBuild.Config): Unit = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val cfg = layoutCfg(store, cfg0)
    val asOf = indexAsOf(spark, outDir)
    val maxBatch = nextBatch(spark, outDir) - 1
    val buckets = pendingTouchedBuckets(spark, store, asOf)
    if (buckets.isEmpty) { // nothing indexed was touched (empty page)
      store.write(spark.range(1).select(lit(maxBatch).as("as_of_batch")),
        "index_meta", SaveMode.Overwrite)
      return
    }

    val alive = aliveRows(spark, store, buckets, asOf)
    val numPartitions = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val merged = IndexBuild.encodeSortedRows(
      alive
        .repartition(numPartitions,
          IndexBuild.segShuffleKeys(cfg.buckets, numPartitions): _*)
        .sortWithinPartitions("term", "shard", "doc_id"),
      cfg.buckets)

    // overwrite ONLY the touched partitions; a bucket whose postings all
    // died produces no rows — dynamic overwrite won't touch it, so its
    // stale partition dir is dropped explicitly
    store.overwritePartitions(merged.toDF, "index", Seq("bucket"))
    val aliveBuckets = alive
      .select(IndexBuild.termBucketCol(cfg.buckets).as("bucket"))
      .distinct().as[Int].collect().toSet
    (buckets.toSet -- aliveBuckets).foreach(b => store.drop(s"index/bucket=$b"))
    store.write(spark.range(1).select(lit(maxBatch).as("as_of_batch")),
      "index_meta", SaveMode.Overwrite)
    // spent tombstones: every batch ≤ maxBatch is folded in now; rows at
    // or below it can never kill anything again (base postings re-read as
    // batch = maxBatch). Bounds tombstone growth under sustained ingest.
    store.readOpt("tombstones").foreach { t =>
      store.replace(t.filter(col("as_of_batch") > maxBatch), "tombstones")
    }
    // prefetch-hint refresh, AMORTIZED on batch-count boundaries: the
    // O(vocabulary) TakeOrdered must ride neither on every engine reload
    // (round-5 ADVICE) nor on every one-page compaction (which would
    // undercut the O(touched) refresh posture from the other side). It
    // runs when the as_of advance crosses a HintEvery boundary — bounded
    // staleness (≤ HintEvery batches) at any compactEvery, including the
    // debt-cap / crashed-compactor recovery folds. Ordering hint only;
    // the engine re-reads current dfs exactly. A missing table (index
    // built before the hint existed) is written on the first compaction.
    if (asOf / HintEvery != maxBatch / HintEvery || !store.exists("mid_terms"))
      IndexBuild.writeMidTerms(store)
  }

  /** Prefetch-hint (mid_terms) refresh cadence, in ingest batches. */
  private val HintEvery = 8

  /** LEGACY full sort-merge: base index + every delta batch with equality
    * deletes applied, then the derived aggregates rebuilt from scratch —
    * the path for indexes predating the forward doc_terms table or the
    * partitioned dim layout (their rewrite also upgrades lemma_stats to
    * the bucket-partitioned layout). Current indexes take the O(touched)
    * `compactTouched` path instead. */
  def mergeWithTombstones(spark: SparkSession, outDir: String,
      cfg0: IndexBuild.Config): Unit = {
    import spark.implicits._
    val store = TableStore.open(spark, outDir)
    val cfg = layoutCfg(store, cfg0)
    val asOf = indexAsOf(spark, outDir)
    val maxBatch = nextBatch(spark, outDir) - 1

    // all buckets — full merge
    val allBuckets = store.read("index").select("bucket").distinct()
      .as[Int].collect().toSeq ++
      store.readOpt("segments").map(_.filter(col("batch") > asOf)
        .select("bucket").distinct().as[Int].collect().toSeq).getOrElse(Nil)
    val alive = aliveRows(spark, store, allBuckets.distinct, asOf)

    val numPartitions = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val merged = IndexBuild.encodeSortedRows(
      alive
        .repartition(numPartitions,
          IndexBuild.segShuffleKeys(cfg.buckets, numPartitions): _*)
        .sortWithinPartitions("term", "shard", "doc_id"),
      cfg.buckets)

    // atomic replace (parquet: write-aside + swap; iceberg: RTAS commit)
    store.replace(merged.toDF, "index", partitionBy = Seq("bucket"))
    store.write(spark.range(1).select(lit(maxBatch).as("as_of_batch")),
      "index_meta", SaveMode.Overwrite)

    // derived aggregates from the SAME alive rows (exact df for the 80%
    // pruning rule) — no second decode of the merged index; written in
    // the bucket-partitioned layout (part of the legacy upgrade)
    val docsDim = store.read("docs")
    store.replace(
      alive.join(docsDim.select("doc_id", "site"), Seq("doc_id"))
        .groupBy("term", "site").agg(count(lit(1)).as("df"))
        .withColumn("bucket", IndexBuild.termBucketCol(cfg.buckets)),
      "lemma_stats", partitionBy = Seq("bucket"))
    // forward doc_terms from the SAME alive rows when the index predates
    // the table — without this the one-time legacy upgrade never
    // completes (incrementalLayout requires doc_terms), and every later
    // refresh would take this O(everything) path forever
    if (!store.exists("doc_terms"))
      store.replace(
        alive.groupBy("doc_id").agg(collect_set(col("term")).as("terms"))
          .withColumn("db", IndexBuild.docBucketCol(cfg.buckets)),
        "doc_terms", partitionBy = Seq("db"))
    // the full merge folds every batch ≤ maxBatch exactly — stamp both
    // delta gates so a stale replayed batch can never re-apply over it
    store.replace(spark.range(1).select(lit(maxBatch).as("as_of_batch")),
      "lemma_stats_meta")
    rebuildStats(spark, store, docsDim, cfg, maxBatch)
    // the legacy path is already O(everything) — also (re)writing the
    // prefetch hint here upgrades pre-hint indexes in the same pass
    IndexBuild.writeMidTerms(store)
  }

  /** corpus-level stats (N, avgdl) from the docs dim — exact after any
    * refresh/delete because docs is replaced latest-version-wins. Used
    * only by the legacy full-merge path; the incremental paths adjust
    * stats from the delta instead. */
  private def rebuildStats(spark: SparkSession, store: TableStore,
      docsDim: DataFrame, cfg: IndexBuild.Config, asOfBatch: Int): Unit = {
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
        .withColumn("buckets", lit(carried("buckets", cfg.buckets)))
        .withColumn("stats_as_of", lit(asOfBatch)),
      "stats")
  }
}

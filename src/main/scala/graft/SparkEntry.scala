package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.DocOps

/** Driver contract (see builder prompt + SURVEY.md §7).
  *
  * Every entry in [[queries]] is one operator from the SURVEY.md §2
  * inventory (or a training-data-pipeline op), expressed Spark-first in
  * [[graft.ops.DocOps]]; [[oracleSql]] carries the value-identical DuckDB
  * SQL the driver cross-checks at sf=0.01. Column names/aliases match
  * pairwise; floats are rounded to 6 dp on both sides; DuckDB sums are
  * cast to BIGINT (DuckDB widens integer sums to HUGEINT, Spark keeps
  * LONG).
  *
  * The Russian reference-semantics engine (lemmatization, WAND segments,
  * snippets — not expressible in portable SQL) is oracle-tested in
  * EngineSpec against a pure-Scala transcription of the reference
  * (rank-identity, both scorers) and exposed here as rows-only entries.
  */
object SparkEntry {

  /** Flagship: BM25 (k1=1.2, b=0.75) top-10 for the fixture query over the
    * sf=0.001 documents corpus. */
  def entry(spark: SparkSession): DataFrame =
    DocOps.bm25Top10(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── search-engine relational core (SURVEY.md §2) ──
    "q01_tf_postings" -> ((s, d) => DocOps.tfPostings(s, d)), // A1
    "q02_df_global" -> ((s, d) => DocOps.dfGlobal(s, d)), // A2
    "q03_df_by_source" -> ((s, d) => DocOps.dfBySource(s, d)), // A2/F6
    "q04_doc_len" -> ((s, d) => DocOps.docLen(s, d)), // BM25 dl
    "q05_stop80" -> ((s, d) => DocOps.stopTerms80(s, d)), // F5
    "q06_rarest_order" -> ((s, d) => DocOps.rarestFirst(s, d)), // O1
    "q07_conjunction" -> ((s, d) => DocOps.conjunction(s, d)), // J1/E1
    "q08_tfsum_scores" -> ((s, d) => DocOps.tfsumScores(s, d)), // A4
    "q09_tfsum_top10" -> ((s, d) => DocOps.tfsumTop10(s, d)), // A5/O2
    "q10_bm25_top10" -> ((s, d) => DocOps.bm25Top10(s, d)), // north_rule
    "q11_bm25_page2" -> ((s, d) => DocOps.bm25Page2(s, d)), // O3
    "q12_tfsum_scoped" -> ((s, d) => DocOps.tfsumScoped(s, d)), // F6
    "q13_stats_pages" -> ((s, d) => DocOps.statsPages(s, d)), // A7
    "q14_stats_lemmas" -> ((s, d) => DocOps.statsLemmas(s, d)), // A8
    "q15_anti_join" -> ((s, d) => DocOps.antiJoin(s, d)), // J4
    "q16_df_merge" -> ((s, d) => DocOps.dfMerge(s, d)), // J6/A3
    "q17_distinct_pairs" -> ((s, d) => DocOps.distinctPairs(s, d)), // E2
    // ── training-data pipeline ops ──
    "q18_dedup_exact" -> ((s, d) => DocOps.dedupExact(s, d)),
    "q19_ngram_jaccard" -> ((s, d) => DocOps.ngramJaccard(s, d)),
    "q20_minhash_lsh" -> ((s, d) => DocOps.minhashLsh(s, d)),
    "q21_simhash" -> ((s, d) => DocOps.simhash(s, d)),
    "q22_ann_cosine_top5" -> ((s, d) => DocOps.annCosineTop5(s, d)),
    "q23_lang_id" -> ((s, d) => DocOps.langId(s, d)),
    "q24_quality_score" -> ((s, d) => DocOps.qualityScore(s, d)),
    "q25_fingerprint" -> ((s, d) => DocOps.fingerprint(s, d)),
    "q26_token_counts" -> ((s, d) => DocOps.tokenCounts(s, d)),
    "q29_ann_lsh_buckets" -> ((s, d) => DocOps.annLshBuckets(s, d)),
    "q35_ann_ivf_cells" -> ((s, d) => DocOps.annIvfCellSizes(s, d)),
    "q36_embed_neardup" -> ((s, d) => DocOps.embedNearDup(s, d)),
    // ── events (windowed/sessionized) ──
    "q27_sessionize" -> ((s, d) => DocOps.sessionize(s, d)), // §2.5-adjacent
    "q28_hourly_window" -> ((s, d) => DocOps.hourlyWindow(s, d)),
    // ── multimodal binary-column plumbing (decode stub; SURVEY.md env) ──
    "q30_media_decode" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.ops.Multimodal.decodeMeta(graft.ops.Multimodal.syntheticMedia(s, d))
        .orderBy(col("media_id"))
    }),
    "q31_media_features" -> ((s, d) => {
      // histogram exploded to (bin, bin_count) rows: every column primitive
      // and sortable, so the driver value-hashes it (round-1 q31 failed on
      // the unhashable array column)
      import org.apache.spark.sql.functions._
      graft.ops.Multimodal.extractFeatures(graft.ops.Multimodal.syntheticMedia(s, d))
        .toDF
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"),
          posexplode(col("histogram")).as(Seq("bin", "bin_count")))
        .orderBy(col("media_id"), col("bin"))
    }),
    "q32_frame_sample" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      graft.ops.Multimodal.sampleFrames(graft.ops.Multimodal.syntheticMedia(s, d), 4)
        .map(f => (f.media_id, f.frame_no, f.frame_bytes.length.toLong))
        .toDF("media_id", "frame_no", "frame_len")
        .orderBy(col("media_id"), col("frame_no"))
    }),
    // ── Structured Streaming (driven synchronously; batch-parity oracles) ──
    "q33_stream_hourly" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val st = graft.streaming.EventsStream
      val q = st.runToMemory(s, st.hourlyCounts(st.readEvents(s, d)),
        "q33_stream_hourly_mem", org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      s.table("q33_stream_hourly_mem").orderBy(col("hour"), col("event_type"))
    }),
    "q34_stream_sessions" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val st = graft.streaming.EventsStream
      // parity mode (idleTimeout = false): the oracle defines exactly the
      // gap-closed sessions; production default closes idle sessions via
      // EventTimeTimeout (StreamingSpec covers the timeout emission)
      val q = st.runToMemory(s, st.sessionize(s, st.readEvents(s, d), idleTimeout = false).toDF,
        "q34_stream_sessions_mem")
      q.stop()
      s.table("q34_stream_sessions_mem")
        .select(col("user_id"), col("n_events"), round(col("sum_value"), 6).as("sum_value"))
        .orderBy(col("user_id"), col("n_events"), col("sum_value"))
    })
  )

  // Shared DuckDB CTE prelude: the Latin-mode tokenizer (F2/F4).
  private val TOK =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      |  FROM documents
      |), tok3 AS (
      |  SELECT doc_id, term FROM tok WHERE length(term) >= 3
      |)""".stripMargin

  private val SURV =
    """, dfg AS (
      |  SELECT term, count(DISTINCT doc_id) AS df FROM tok3 GROUP BY term
      |), surv AS (
      |  SELECT term, df FROM dfg
      |  WHERE term IN ('spark', 'merge', 'batch')
      |    AND df * 100.0 / (SELECT count(*) FROM documents) <= 80.0
      |)""".stripMargin

  private val SHINGLES =
    """WITH arrs AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> length(t) >= 1) AS arr
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id,
      |           unnest(list_filter(
      |             list_transform(list_zip(arr, arr[2:], arr[3:]),
      |                            x -> x[1] || ' ' || x[2] || ' ' || x[3]),
      |             s -> s IS NOT NULL)) AS sh
      |    FROM arrs WHERE len(arr) >= 3
      |  )
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_tf_postings" ->
      s"""$TOK SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |FROM tok3 GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,

    "q02_df_global" ->
      s"""$TOK SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |FROM tok3 GROUP BY term ORDER BY term""".stripMargin,

    "q03_df_by_source" ->
      """WITH tok AS (
        |  SELECT doc_id, source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        |  FROM documents
        |)
        |SELECT term, source, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM tok WHERE length(term) >= 3
        |GROUP BY term, source ORDER BY term, source""".stripMargin,

    "q04_doc_len" ->
      s"""$TOK SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS BIGINT) AS dl
         |FROM documents d
         |LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tok3 GROUP BY doc_id) t USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q05_stop80" ->
      s"""$TOK SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |FROM tok3 GROUP BY term
         |HAVING count(DISTINCT doc_id) * 100.0 / (SELECT count(*) FROM documents) > 80.0
         |ORDER BY term""".stripMargin,

    "q06_rarest_order" ->
      s"""$TOK $SURV SELECT term, CAST(df AS BIGINT) AS df FROM surv ORDER BY df, term""".stripMargin,

    "q07_conjunction" ->
      s"""$TOK $SURV
         |SELECT doc_id FROM tok3 WHERE term IN (SELECT term FROM surv)
         |GROUP BY doc_id
         |HAVING count(DISTINCT term) = (SELECT count(*) FROM surv)
         |ORDER BY doc_id""".stripMargin,

    "q08_tfsum_scores" ->
      s"""$TOK $SURV
         |SELECT doc_id, CAST(count(*) AS DOUBLE) AS abs_rel
         |FROM tok3 WHERE term IN (SELECT term FROM surv)
         |GROUP BY doc_id
         |HAVING count(DISTINCT term) = (SELECT count(*) FROM surv)
         |ORDER BY doc_id""".stripMargin,

    "q09_tfsum_top10" ->
      s"""$TOK $SURV, scores AS (
         |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS abs_rel
         |  FROM tok3 WHERE term IN (SELECT term FROM surv)
         |  GROUP BY doc_id
         |  HAVING count(DISTINCT term) = (SELECT count(*) FROM surv)
         |)
         |SELECT doc_id, round(abs_rel / max(abs_rel) OVER (), 6) AS rel
         |FROM scores ORDER BY rel DESC, doc_id LIMIT 10""".stripMargin,

    "q10_bm25_top10" -> bm25Sql(limit = 10, offset = 0),
    "q11_bm25_page2" -> bm25Sql(limit = 10, offset = 10),

    "q12_tfsum_scoped" ->
      """WITH docs AS (SELECT * FROM documents WHERE source = 'src3'),
        |tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term FROM docs
        |), tok3 AS (SELECT doc_id, term FROM tok WHERE length(term) >= 3
        |), dfg AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok3 GROUP BY term
        |), surv AS (
        |  SELECT term FROM dfg
        |  WHERE term IN ('spark', 'merge', 'batch')
        |    AND df * 100.0 / (SELECT count(*) FROM docs) <= 80.0
        |), scores AS (
        |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS abs_rel
        |  FROM tok3 WHERE term IN (SELECT term FROM surv)
        |  GROUP BY doc_id
        |  HAVING count(DISTINCT term) = (SELECT count(*) FROM surv)
        |)
        |SELECT doc_id, round(abs_rel / max(abs_rel) OVER (), 6) AS rel
        |FROM scores ORDER BY rel DESC, doc_id LIMIT 10""".stripMargin,

    "q13_stats_pages" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS pages
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q14_stats_lemmas" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        |  FROM documents
        |)
        |SELECT source, CAST(count(DISTINCT term) AS BIGINT) AS lemmas
        |FROM tok WHERE length(term) >= 3
        |GROUP BY source ORDER BY source""".stripMargin,

    "q15_anti_join" ->
      s"""$TOK
         |SELECT DISTINCT doc_id FROM tok3 WHERE term = 'spark'
         |  AND doc_id NOT IN (SELECT doc_id FROM tok3 WHERE term = 'dup')
         |ORDER BY doc_id""".stripMargin,

    "q16_df_merge" ->
      s"""$TOK, halves AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM tok3 WHERE doc_id % 2 = 0 GROUP BY term
         |  UNION ALL
         |  SELECT term, count(DISTINCT doc_id) AS df FROM tok3 WHERE doc_id % 2 = 1 GROUP BY term
         |)
         |SELECT term, CAST(sum(df) AS BIGINT) AS df FROM halves GROUP BY term ORDER BY term""".stripMargin,

    "q17_distinct_pairs" ->
      "SELECT DISTINCT lang, source FROM documents ORDER BY lang, source",

    "q18_dedup_exact" ->
      """SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS keep_doc
        |FROM documents GROUP BY md5(text) HAVING count(*) > 1 ORDER BY h""".stripMargin,

    "q19_ngram_jaccard" ->
      s"""$SHINGLES, sizes AS (
         |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
         |), pairs AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
         |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id
         |)
         |SELECT a, b, round(common / (sa.sz + sb.sz - common)::DOUBLE, 6) AS jaccard
         |FROM pairs
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE common / (sa.sz + sb.sz - common)::DOUBLE >= 0.3
         |ORDER BY a, b""".stripMargin,

    "q20_minhash_lsh" ->
      s"""$SHINGLES, sig AS (
         |  SELECT doc_id, g.seed,
         |         min(md5(CAST(g.seed AS VARCHAR) || ':' || sh)) AS sig
         |  FROM sh CROSS JOIN generate_series(0, 7) g(seed)
         |  GROUP BY doc_id, g.seed
         |), bands AS (
         |  SELECT doc_id, CAST(floor(seed / 2) AS INT) AS band,
         |         string_agg(sig, '|' ORDER BY seed) AS bandsig
         |  FROM sig GROUP BY doc_id, CAST(floor(seed / 2) AS INT)
         |)
         |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bandsig = y.bandsig AND x.doc_id < y.doc_id
         |ORDER BY a, b""".stripMargin,

    "q21_simhash" ->
      s"""$TOK, dtok AS (
         |  SELECT DISTINCT doc_id, term FROM tok3
         |), hb AS (
         |  SELECT doc_id, md5(term) AS h, g.bit FROM dtok CROSS JOIN generate_series(0, 15) g(bit)
         |), bits AS (
         |  SELECT doc_id, bit,
         |    CASE WHEN CAST(floor((strpos('0123456789abcdef', substr(h, CAST(floor(bit / 4) AS INT) + 1, 1)) - 1)
         |                    / pow(2, 3 - bit % 4)) AS INT) % 2 = 1
         |         THEN 1 ELSE -1 END AS bitval
         |  FROM hb
         |), sums AS (
         |  SELECT doc_id, bit, sum(bitval) AS s FROM bits GROUP BY doc_id, bit
         |)
         |SELECT doc_id,
         |       CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         |FROM sums GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q22_ann_cosine_top5" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), q AS (
        |  SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)
        |), cos AS (
        |  SELECT q.qid, e.vec_id,
        |    round(
        |      list_sum(list_transform(list_zip(e.v, q.qv), x -> x[1] * x[2])) /
        |      (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |       sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6) AS cosine
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.qid
        |), ranked AS (
        |  SELECT qid, vec_id, cosine,
        |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cos
        |)
        |SELECT qid, CAST(rank AS INT) AS rank, vec_id, cosine
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q23_lang_id" ->
      s"""$TOK, hits AS (
         |  SELECT doc_id, 'de' AS lang, count(*) AS hits FROM tok3 WHERE term IN ('der', 'und', 'die', 'mit') GROUP BY doc_id
         |  UNION ALL
         |  SELECT doc_id, 'en', count(*) FROM tok3 WHERE term IN ('the', 'and', 'for', 'with') GROUP BY doc_id
         |  UNION ALL
         |  SELECT doc_id, 'es', count(*) FROM tok3 WHERE term IN ('los', 'las', 'una', 'con') GROUP BY doc_id
         |  UNION ALL
         |  SELECT doc_id, 'fr', count(*) FROM tok3 WHERE term IN ('les', 'des', 'une', 'avec') GROUP BY doc_id
         |), pred AS (
         |  SELECT doc_id, lang, hits,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
         |  FROM hits
         |)
         |SELECT d.doc_id,
         |       coalesce(p.lang, 'unk') AS pred_lang,
         |       CAST(coalesce(p.hits, 0) AS BIGINT) AS hits
         |FROM documents d LEFT JOIN (SELECT * FROM pred WHERE rn = 1) p USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q24_quality_score" ->
      s"""$TOK, agg AS (
         |  SELECT doc_id,
         |         count(*) AS n_tokens,
         |         count(DISTINCT term) AS n_distinct,
         |         round(avg(length(term)), 6) AS mean_len,
         |         round(sum(CASE WHEN term IN ('the','and','for','with','los','las','der','und','les','des') THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS stop_ratio
         |  FROM tok3 GROUP BY doc_id
         |)
         |SELECT d.doc_id, d.n_chars,
         |       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
         |       coalesce(a.mean_len, 0.0) AS mean_len,
         |       coalesce(a.stop_ratio, 0.0) AS stop_ratio,
         |       round(least(1.0, coalesce(a.n_tokens, 0) / 100.0) *
         |             (coalesce(a.n_distinct, 0) / greatest(CAST(coalesce(a.n_tokens, 0) AS DOUBLE), 1.0)), 6) AS quality
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q25_fingerprint" ->
      s"""$TOK, dtok AS (SELECT DISTINCT doc_id, term FROM tok3)
         |SELECT doc_id, md5(string_agg(term, '|' ORDER BY term)) AS fp
         |FROM dtok GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q26_token_counts" ->
      s"""$TOK SELECT doc_id,
         |       CAST(count(*) AS BIGINT) AS ws_tokens,
         |       CAST(sum(ceil(length(term) / 4.0)) AS BIGINT) AS subword_tokens
         |FROM tok3 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q27_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM o
        |), s AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM m
        |)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
        |       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 6) AS sum_value
        |FROM s GROUP BY user_id, sess_no ORDER BY user_id, sess_no""".stripMargin,

    "q28_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS v
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,

    "q35_ann_ivf_cells" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), cents AS (
        |  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16
        |), cos AS (
        |  SELECT e.vec_id, cents.cell,
        |    round(
        |      list_sum(list_transform(list_zip(e.v, cents.cv), x -> x[1] * x[2])) /
        |      (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |       sqrt(list_sum(list_transform(cents.cv, x -> x * x)))), 6) AS cos
        |  FROM e CROSS JOIN cents
        |), assigned AS (
        |  SELECT vec_id, cell,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        |  FROM cos
        |)
        |SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors
        |FROM assigned WHERE rn = 1 GROUP BY cell ORDER BY cell""".stripMargin,

    "q30_media_decode" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |       true AS decode_ok,
        |       CAST(16 + doc_id % 64 AS INT) AS width,
        |       CAST(16 + doc_id % 48 AS INT) AS height,
        |       CAST(1000 + doc_id % 9000 AS INT) AS duration_ms,
        |       true AS meta_consistent
        |FROM documents ORDER BY media_id""".stripMargin,

    // payload body = utf-8 bytes of `text` cycled to need=256+doc_id%1024
    // (Multimodal.syntheticMedia); byte values recovered in SQL from the
    // hex dump of the blob, so the histogram is engine-portable
    "q31_media_features" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |         CAST(256 + doc_id % 1024 AS BIGINT) AS need,
        |         upper(hex(encode(text))) AS hx,
        |         greatest(octet_length(encode(text)), 1) AS tl
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, kind, need, hx, tl,
        |         unnest(generate_series(0, CAST(need AS INT) - 1)) AS i
        |  FROM b
        |), byteval AS (
        |  SELECT doc_id, kind, need,
        |    (strpos('0123456789ABCDEF', substr(hx, CAST(2 * (i % tl) AS INT) + 1, 1)) - 1) * 16 +
        |    (strpos('0123456789ABCDEF', substr(hx, CAST(2 * (i % tl) AS INT) + 2, 1)) - 1) AS v
        |  FROM pos
        |), agg AS (
        |  SELECT doc_id, kind, need, round(sum(v) / CAST(need AS DOUBLE), 6) AS mean_byte
        |  FROM byteval GROUP BY doc_id, kind, need
        |), bins AS (
        |  SELECT doc_id, v // 16 AS bin, count(*) AS cnt
        |  FROM byteval GROUP BY doc_id, v // 16
        |)
        |SELECT a.doc_id AS media_id, a.kind, a.need AS n_bytes, a.mean_byte,
        |       CAST(g.bin AS INT) AS bin, CAST(coalesce(bins.cnt, 0) AS BIGINT) AS bin_count
        |FROM agg a CROSS JOIN generate_series(0, 15) g(bin)
        |LEFT JOIN bins ON bins.doc_id = a.doc_id AND bins.bin = g.bin
        |ORDER BY media_id, bin""".stripMargin,

    "q32_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(g.f AS INT) AS frame_no,
        |       CAST(floor((256 + doc_id % 1024) / 4) AS BIGINT) AS frame_len
        |FROM documents CROSS JOIN generate_series(0, 3) g(f)
        |WHERE doc_id % 3 = 2 ORDER BY media_id, frame_no""".stripMargin,

    "q33_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS v
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,

    "q34_stream_sessions" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM o
        |), s AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM m
        |), sess AS (
        |  SELECT user_id, sess_no, CAST(count(*) AS BIGINT) AS n_events,
        |         round(sum(value), 6) AS sum_value
        |  FROM s GROUP BY user_id, sess_no
        |), last AS (
        |  SELECT user_id, max(sess_no) AS m FROM sess GROUP BY user_id
        |)
        |SELECT sess.user_id, sess.n_events, sess.sum_value
        |FROM sess JOIN last ON sess.user_id = last.user_id AND sess.sess_no < last.m
        |ORDER BY sess.user_id, sess.n_events, sess.sum_value""".stripMargin,

    // banded hyperplane LSH near-dup: same plane derivation as q29; a pair
    // is a candidate iff some 2-plane band signature collides; exact
    // cosine only on candidates; threshold on the 6-dp-rounded value
    "q36_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), ve AS (
        |  SELECT vec_id, i.i, v[i.i + 1] AS x FROM e CROSS JOIN generate_series(0, 63) i(i)
        |), planes AS (
        |  SELECT p.p, i.i,
        |         strpos('0123456789abcdef',
        |                substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1)) - 8.5 AS w
        |  FROM generate_series(0, 7) p(p) CROSS JOIN generate_series(0, 63) i(i)
        |), proj AS (
        |  SELECT ve.vec_id, planes.p, sum(ve.x * planes.w) AS s
        |  FROM ve JOIN planes ON ve.i = planes.i
        |  GROUP BY ve.vec_id, planes.p
        |), sigs AS (
        |  SELECT vec_id, p // 2 AS band,
        |         CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, p % 2) AS INT) ELSE 0 END) AS INT) AS sig
        |  FROM proj GROUP BY vec_id, p // 2
        |), cand AS (
        |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM sigs x JOIN sigs y
        |    ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
        |), cos AS (
        |  SELECT cand.a, cand.b,
        |    round(list_sum(list_transform(list_zip(ea.v, eb.v), t -> t[1] * t[2])) /
        |      (sqrt(list_sum(list_transform(ea.v, t -> t * t))) *
        |       sqrt(list_sum(list_transform(eb.v, t -> t * t)))), 6) AS cosine
        |  FROM cand
        |  JOIN e ea ON ea.vec_id = cand.a
        |  JOIN e eb ON eb.vec_id = cand.b
        |)
        |SELECT a, b, cosine FROM cos WHERE cosine >= 0.4 ORDER BY a, b""".stripMargin,

    "q29_ann_lsh_buckets" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), ve AS (
        |  SELECT vec_id, i.i, v[i.i + 1] AS x FROM e CROSS JOIN generate_series(0, 63) i(i)
        |), planes AS (
        |  SELECT p.p, i.i,
        |         strpos('0123456789abcdef',
        |                substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1)) - 8.5 AS w
        |  FROM generate_series(0, 7) p(p) CROSS JOIN generate_series(0, 63) i(i)
        |), proj AS (
        |  SELECT ve.vec_id, planes.p, sum(ve.x * planes.w) AS s
        |  FROM ve JOIN planes ON ve.i = planes.i
        |  GROUP BY ve.vec_id, planes.p
        |), buckets AS (
        |  SELECT vec_id,
        |         CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, p) AS INT) ELSE 0 END) AS INT) AS bucket
        |  FROM proj GROUP BY vec_id
        |)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors
        |FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin
  )

  private def bm25Sql(limit: Int, offset: Int): String =
    s"""$TOK $SURV, dl AS (
       |  SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS BIGINT) AS dl
       |  FROM documents d
       |  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tok3 GROUP BY doc_id) t USING (doc_id)
       |), st AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok3
       |  WHERE term IN (SELECT term FROM surv) GROUP BY doc_id, term
       |), cand AS (
       |  SELECT doc_id FROM tf GROUP BY doc_id
       |  HAVING count(*) = (SELECT count(*) FROM surv)
       |), scored AS (
       |  SELECT tf.doc_id,
       |         sum(greatest(0.0, ln((st.n - surv.df + 0.5) / (surv.df + 0.5) + 1.0))
       |             * tf.tf * (1.2 + 1.0)
       |             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
       |  FROM tf
       |  JOIN cand USING (doc_id)
       |  JOIN surv ON surv.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN st
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, round(s, 6) AS score FROM scored
       |ORDER BY score DESC, doc_id LIMIT $limit OFFSET $offset""".stripMargin
}

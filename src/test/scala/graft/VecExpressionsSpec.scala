package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecExpressions

/** Native codegen'd cosine expression (§2.9 custom kernels): value
  * identity with the composed aggregate/zip_with built-in form it
  * replaced, null semantics, interpreted-vs-codegen agreement, and the
  * SQL registration surface. */
class VecExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    VecExpressions.register(s)
    s
  }

  private def vecDf = {
    import spark.implicits._
    // deterministic pseudo-random vectors incl. negatives and zeros
    val rows = (0 until 50).map { k =>
      val v = Array.tabulate(16)(i => math.sin(k * 31 + i * 7).toDouble)
      val q = Array.tabulate(16)(i => math.cos(k * 17 + i * 3).toDouble)
      (k.toLong, v, q)
    }
    rows.toDF("id", "v", "q")
  }

  private val builtinForm =
    expr("""aggregate(zip_with(v, q, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
           | / (sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))
           |    * sqrt(aggregate(q, 0D, (acc, x) -> acc + x * x)))""".stripMargin)

  test("bit-identical to the aggregate/zip_with built-in chain") {
    import spark.implicits._
    val df = vecDf
      .withColumn("a", VecExpressions.cosineSim(col("v"), col("q")))
      .withColumn("b", builtinForm)
    val rows = df.select("a", "b").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b) => assert(a == b, s"$a != $b") } // exact, not approx
  }

  test("null semantics: null array, length mismatch, null element -> null; empty -> NaN") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(1.0, 2.0)), // plain
      (2L, null.asInstanceOf[Array[Double]], Array(1.0, 2.0)), // null input
      (3L, Array(1.0), Array(1.0, 2.0)), // length mismatch
      (4L, Array[Double](), Array[Double]()) // empty -> 0/0 = NaN
    ).toDF("id", "v", "q")
      .withColumn("c", VecExpressions.cosineSim(col("v"), col("q")))
    val m = df.select("id", "c").as[(Long, Option[Double])].collect().toMap
    assert(m(1L).exists(c => math.abs(c - 1.0) < 1e-12))
    assert(m(2L).isEmpty)
    assert(m(3L).isEmpty)
    assert(m(4L).exists(_.isNaN))
    // null ELEMENT inside an array (SQL literal route)
    val e = spark.sql(
      "SELECT graft_cosine(array(1.0D, cast(null as double)), array(1.0D, 2.0D)) c")
      .as[Option[Double]].collect()(0)
    assert(e.isEmpty)
  }

  test("whole-stage codegen compiles the expression (no fallback) and matches interpreted eval") {
    import spark.implicits._
    // repartition forces a real executed stage — a pure-literal projection
    // would collapse to LocalTableScan with no codegen span at all
    val sel = vecDf.repartition(2)
      .withColumn("c", VecExpressions.cosineSim(col("v"), col("q")))
      .select("id", "c")
    val rows = sel.collect() // execute FIRST — AQE materializes the final
    // plan (with its WholeStageCodegen stages) only once the query ran
    val planStr = sel.queryExecution.executedPlan.toString
    // codegen stages render as "WholeStageCodegen (n)" or the starred
    // form "*(n) Project ..." depending on the plan printer
    assert(planStr.contains("WholeStageCodegen") || planStr.contains("*("),
      s"no codegen span in:\n$planStr")
    assert(planStr.matches("(?s).*\\*\\(\\d+\\) Project \\[[^\\]]*graft_cosine.*"),
      s"graft_cosine not inside a codegen'd Project:\n$planStr")
    val withCodegen = rows.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = vecDf.withColumn("c", VecExpressions.cosineSim(col("v"), col("q")))
        .select("id", "c").as[(Long, Double)].collect().sortBy(_._1)
      assert(withCodegen.toSeq == interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("SQL surface: graft_cosine usable from spark.sql after register()") {
    import spark.implicits._
    val c = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) c")
      .as[Double].collect()(0)
    assert(c == 0.0)
    // type check rejects non-double arrays with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array('x'), array('y'))").collect()
    }
    assert(err.getMessage.contains("graft_cosine") ||
      err.getMessage.toLowerCase.contains("array<double>"))
  }

  test("GraftExtensions injects the function (extension-point smoke)") {
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
  }

  // ── round-6 native expressions: BandSigs + SimHash16 ──

  /** The exact round-5 composed-built-in band-sig chain BandSigs
    * replaced, with the plane matrix as a literal (the md5 derivation
    * duplicated here on purpose — the test fails if either side drifts). */
  private def hofBandSigs(nPlanes: Int, bandSize: Int, dims: Int) = {
    def weight(p: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((h(0) >> 4) & 0xf).toDouble - 7.5
    }
    val planes = (0 until nPlanes).map(p => (0 until dims).map(i => weight(p, i)))
    val nBands = nPlanes / bandSize
    expr(
      s"""transform(sequence(0, ${nBands - 1}, 1), b ->
         |  aggregate(transform(sequence(0, ${bandSize - 1}, 1), p ->
         |    case when aggregate(zip_with(v, planes[b * $bandSize + p], (x, w) -> x * w),
         |                        0D, (acc, x) -> acc + x) > 0
         |         then cast(pow(2, p) as int) else 0 end),
         |    0, (acc, x) -> acc + x))""".stripMargin) -> typedLit(planes)
  }

  test("BandSigs bit-identical to the round-5 aggregate/zip_with band chain") {
    import spark.implicits._
    val dims = 16
    val df = vecDf // v has negatives, zeros, positives
    for ((nPlanes, bandSize) <- Seq((8, 2), (8, 8), (4, 1))) {
      val (hof, planes) = hofBandSigs(nPlanes, bandSize, dims)
      val rows = df.withColumn("planes", planes)
        .withColumn("native", VecExpressions.bandSigs(col("v"), nPlanes, bandSize))
        .withColumn("hof", hof)
        .select("id", "native", "hof")
        .as[(Long, Seq[Int], Seq[Int])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (id, a, b) =>
        assert(a == b, s"id=$id planes=$nPlanes band=$bandSize: $a != $b")
      }
    }
  }

  test("BandSigs: plane weights memoized per dims; SQL surface registered") {
    import spark.implicits._
    val sigs = spark.sql(
      "SELECT graft_band_sigs(array(1.0D, -2.0D, 0.5D), 4, 2) s")
      .as[Seq[Int]].collect()(0)
    assert(sigs.length == 2)
    sigs.foreach(s => assert(s >= 0 && s < 4)) // 2 bits per band
  }

  /** Reference simhash over the 16-bit md5-prefix ints: the q21 oracle's
    * nibble arithmetic, reimplemented longhand. */
  private def refSimhash(vals: Seq[Int]): Long = {
    val s = new Array[Int](16)
    for (v <- vals; i <- 0 until 16) {
      val nibble = (v >> (12 - 4 * (i / 4))) & 0xf
      if ((nibble / math.pow(2, 3 - i % 4).toInt) % 2 == 1) s(i) += 1 else s(i) -= 1
    }
    (0 until 16).map(i => if (s(i) > 0) 1L << i else 0L).sum
  }

  test("SimHash16 matches the oracle nibble arithmetic (and the q21 wire form)") {
    import spark.implicits._
    val rows = (0 until 40).map { k =>
      (k.toLong, (0 until (k % 7) + 1).map(j => (k * 131 + j * 7919) % 65536).toSeq)
    }
    val df = rows.toDF("id", "vals")
      .withColumn("vals", col("vals").cast("array<int>"))
      .withColumn("native", VecExpressions.simHash16(col("vals")))
    val got = df.select("id", "native").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, vals) =>
      assert(got(id) == refSimhash(vals.map(_.toInt)), s"id=$id")
    }
    // end-to-end: the exact q21 per-term int derivation (conv of the
    // first 4 md5 hex digits) feeds the expression via SQL
    val e2e = spark.sql(
      """SELECT graft_simhash16(transform(array('alpha', 'beta', 'gamma'),
        |  t -> cast(conv(substr(md5(cast(t as binary)), 1, 4), 16, 10) as int))) h""".stripMargin)
      .as[Long].collect()(0)
    def md516(t: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((h(0) & 0xff) << 8) | (h(1) & 0xff)
    }
    assert(e2e == refSimhash(Seq("alpha", "beta", "gamma").map(md516)))
  }
}

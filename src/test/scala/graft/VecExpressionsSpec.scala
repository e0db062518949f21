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
}

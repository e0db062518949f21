package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DocOps

/** Pins the round-6 row-local IVF assignment (driver-literal centroids +
  * `greatest` over (cos, -cell) structs — no cross join, no window
  * exchange) value-identical to the windowed cross-join form it replaced:
  * same argmax, same tie-break (max cosine, then LOWEST cell), over the
  * real sf0.001 fixture. */
class IvfAssignSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("row-local IVF argmax == windowed cross-join assignment (round-5 form)") {
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VecExpressions.register(spark)
    val emb = DocOps.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // the replaced round-5 plan, verbatim: broadcast cross join against the
    // centroid rows + row_number window (cos DESC, cell ASC)
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), col("cell"))
    val reference = emb.crossJoin(broadcast(cents))
      .withColumn("cos", round(
        graft.functions.VecExpressions.cosineSim(col("v"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
      .collect().toSeq.map(_.toSeq)
    val got = DocOps.annIvfCells(spark, dir).collect().toSeq.map(_.toSeq)
    assert(got.nonEmpty)
    assert(got == reference)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two double vectors as a NATIVE Catalyst
  * expression with whole-stage codegen (`doGenCode`) — the builder-prompt
  * preference order for custom scalar kernels: composed built-ins, then a
  * native `Expression`, then (last) a Scala UDF.
  *
  * The composed-built-in form this replaces on the ANN hot paths —
  *
  *   aggregate(zip_with(v, q, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
  *     / (sqrt(aggregate(v, 0D, (a, x) -> a + x*x))
  *        * sqrt(aggregate(q, 0D, (a, x) -> a + x*x)))
  *
  * — materializes an intermediate zip array and walks both vectors four
  * times through per-element lambda dispatch; this expression fuses all
  * three folds into ONE loop with no allocation, inside the same
  * WholeStageCodegen span as the surrounding operators. Accumulation
  * order matches the fold above exactly (left-to-right sums, then
  * dot / (sqrt(nv) * sqrt(nq))), so results are bit-identical and the
  * DuckDB oracles are unaffected.
  *
  * Null semantics mirror the built-in chain: null input array, length
  * mismatch, or a null element → null (zip_with pads / null-propagates
  * through the fold there; here it is an explicit null-out).
  */
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ImplicitCastInputTypes (private[sql] in 4.1): callers cast to
  // array<double> explicitly (the ANN ops already do), enforced here
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = $a.getDouble($i);
         |    final double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv;
         |    $nx += $xv * $xv;
         |    $ny += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {

  /** Column-API form: `cosineSim(col("v"), col("qv"))`. Resolves through
    * the function registry (Column-from-catalyst-Expression constructors
    * are private[sql] in 4.1) — call [[register]] on the session first. */
  def cosineSim(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSim].getCanonicalName, "graft_cosine")

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_cosine takes 2 arguments, got ${args.length}")
    CosineSim(args(0), args(1))
  }

  /** Runtime registration: `SELECT graft_cosine(v, q)` in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cosine"), cosineInfo, cosineBuilder _)
}

/** `spark.sql.extensions`-style injection
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`):
  * the deployment form of [[VecExpressions.register]] — the expression is
  * available in every session of the application, including SQL-only
  * clients, without driver code. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier("graft_cosine"),
        new ExpressionInfo(classOf[CosineSim].getCanonicalName, "graft_cosine"),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"graft_cosine takes 2 arguments, got ${args.length}")
          CosineSim(args(0), args(1))
        }))
}

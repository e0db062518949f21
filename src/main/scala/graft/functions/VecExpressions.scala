package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

/** Banded random-hyperplane LSH signatures as a NATIVE codegen'd
  * expression — the fused form of the composed-built-in chain used by the
  * ANN ops through round 5:
  *
  *   transform(sequence(0, nBands-1), b ->
  *     aggregate(transform(sequence(0, bandSize-1), p ->
  *       case when aggregate(zip_with(v, planes[b*bandSize+p], (x,w) -> x*w),
  *                           0D, (acc,x) -> acc + x) > 0
  *            then cast(pow(2, p) as int) else 0 end), 0, (acc,x) -> acc+x))
  *
  * That chain is interpreted lambda dispatch over every vector element,
  * and the optimizer DUPLICATES it (a `size(...) > 0` filter inferred
  * below the explode, plus once per side of the candidate self-join), so
  * round 5's q36 evaluated 8×64 interpreted dot products 4+ times per
  * row. This expression runs the nPlanes dot products in one fused native
  * loop per row (guide §1.2 "per-task work" + §4.1 "prefer expressions").
  *
  * The plane matrix is the SAME md5 derivation as round 5's driver-side
  * [[graft.ops.DocOps]] constant — weight(p, i) = high nibble of
  * md5("p:i")[0] minus 7.5 — memoized per input dimensionality inside the
  * expression, which also removes the per-query `dims` lookup job and the
  * 512-double literal from the plan. Accumulation order matches the fold
  * above exactly (left-to-right), so band signatures are bit-identical
  * and the DuckDB oracles are unaffected. A null element makes that
  * plane's projection null, which the CASE turned into a 0 bit — mirrored
  * here (no nulls occur in the embeddings tables).
  */
final case class BandSigs(child: Expression, nPlanes: Int, bandSize: Int)
    extends UnaryExpression {
  require(nPlanes > 0 && bandSize > 0 && nPlanes % bandSize == 0,
    s"nPlanes=$nPlanes must be a positive multiple of bandSize=$bandSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_band_sigs"

  // plane weights memoized per dims (dims is constant per table in
  // practice; the map guards against mixed-width inputs)
  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  def planesFor(dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dims, d => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(nPlanes, d) { (p, i) =>
        md.reset()
        val h = md.digest(s"$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        ((h(0) >> 4) & 0xf).toDouble - 7.5
      }
    })

  def compute(x: ArrayData): GenericArrayData = {
    val dims = x.numElements()
    val planes = planesFor(dims)
    val nBands = nPlanes / bandSize
    val sigs = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var sig = 0
      var p = 0
      while (p < bandSize) {
        val w = planes(b * bandSize + p)
        var dot = 0.0
        var nullDot = false
        var i = 0
        while (i < dims && !nullDot) {
          if (x.isNullAt(i)) nullDot = true
          else dot += x.getDouble(i) * w(i)
          i += 1
        }
        if (!nullDot && dot > 0.0) sig |= 1 << p
        p += 1
      }
      sigs(b) = sig
      b += 1
    }
    new GenericArrayData(sigs)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandSigs", this, classOf[BandSigs].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): BandSigs =
    copy(child = newChild)
}

/** 16-bit SimHash majority vote as a NATIVE codegen'd expression: input
  * is the per-term 16-bit md5 prefix (`conv(substr(md5(term), 1, 4), 16,
  * 10)` — bit i of the simhash reads bit (15-i) of that value, exactly
  * the nibble arithmetic of the q21 oracle), output is the simhash with
  * bit i set iff strictly more terms set bit i than clear it. Replaces
  * round 5's explode-to-16-rows + two aggregation exchanges with one
  * fused loop per document (null elements are skipped, mirroring
  * SQL `sum` null-skipping; none occur — md5 of a non-null term). */
final case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash16"

  def compute(x: ArrayData): Long = {
    val n = x.numElements()
    val s = new Array[Int](16)
    var j = 0
    while (j < n) {
      if (!x.isNullAt(j)) {
        val v = x.getInt(j)
        var i = 0
        while (i < 16) {
          if (((v >> (15 - i)) & 1) == 1) s(i) += 1 else s(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 16) {
      if (s(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash16].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object VecExpressions {

  /** Column-API form: `cosineSim(col("v"), col("qv"))`. Resolves through
    * the function registry (Column-from-catalyst-Expression constructors
    * are private[sql] in 4.1) — call [[register]] on the session first. */
  def cosineSim(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Column-API form: `bandSigs(col("v"), 8, 2)` → array<int> of
    * nPlanes/bandSize band signatures. */
  def bandSigs(v: Column, nPlanes: Int, bandSize: Int): Column =
    call_function("graft_band_sigs", v,
      org.apache.spark.sql.functions.lit(nPlanes),
      org.apache.spark.sql.functions.lit(bandSize))

  /** Column-API form: `simHash16(col("v16"))` over the per-term 16-bit
    * md5 prefixes → bigint simhash. */
  def simHash16(v16: Column): Column =
    call_function("graft_simhash16", v16)

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSim].getCanonicalName, "graft_cosine")
  private val bandSigsInfo = new ExpressionInfo(
    classOf[BandSigs].getCanonicalName, "graft_band_sigs")
  private val simHashInfo = new ExpressionInfo(
    classOf[SimHash16].getCanonicalName, "graft_simhash16")

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_cosine takes 2 arguments, got ${args.length}")
    CosineSim(args(0), args(1))
  }

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
    }
  }

  private def bandSigsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3, s"graft_band_sigs takes 3 arguments, got ${args.length}")
    BandSigs(args(0), litInt(args(1), "nPlanes"), litInt(args(2), "bandSize"))
  }

  private def simHashBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"graft_simhash16 takes 1 argument, got ${args.length}")
    SimHash16(args(0))
  }

  /** The three (identifier, info, builder) registrations — one source of
    * truth for both the runtime registry and the extension injection. */
  private[functions] val injectable
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"), cosineInfo, cosineBuilder _),
    (FunctionIdentifier("graft_band_sigs"), bandSigsInfo, bandSigsBuilder _),
    (FunctionIdentifier("graft_simhash16"), simHashInfo, simHashBuilder _))

  /** Runtime registration: `SELECT graft_cosine(v, q)` etc. in the session. */
  def register(spark: SparkSession): Unit =
    injectable.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions`-style injection
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`):
  * the deployment form of [[VecExpressions.register]] — the expression is
  * available in every session of the application, including SQL-only
  * clients, without driver code. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    // one builder per function, SHARED with the runtime registry
    // (VecExpressions.register) so argument validation/messages can
    // never diverge between the two registration paths
    VecExpressions.injectable.foreach(ext.injectFunction)
}

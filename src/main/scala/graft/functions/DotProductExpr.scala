package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in double.
  *
  * Why a custom Expression (builder-brief preference order (b)): the
  * `aggregate(zip_with(a, b, *), …)` composition of built-ins is
  * semantically identical but runs interpreted per element with boxed
  * Doubles and two intermediate arrays — ~20× slower on 64-dim embeddings.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen (with an interpreted `nullSafeEval` fallback), which is what a
  * 100 TB similarity scan needs.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Nullable even when both inputs are non-nullable: a null ELEMENT
    * null-propagates the result. Inheriting child nullability here makes
    * codegen treat the isNull slot as a constant, and the in-loop
    * `isNull = true` assignment fails to compile — silently demoting the
    * whole projection to interpreted mode (CodegenHygieneSpec). */
  override def nullable: Boolean = true

  /** Accepts array<float> and array<double> on either side (embeddings are
    * float; hyperplane literals are double). Products accumulate in double
    * regardless — slightly MORE precise than the float-product HOF
    * formulation. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Null ELEMENTS null-propagate the whole result — matching the
    * `aggregate(zip_with(...))` reference semantics (`dotHof`), where one
    * null product nulls the accumulation. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, idx: String, float: Boolean) =
      if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
    // freshName, not fixed names: two dot calls in one generated method
    // (cosine alone expands to three) would otherwise redeclare the same
    // locals — a javac error that silently demotes the WHOLE projection
    // to interpreted mode.
    val n = ctx.freshName("graftN")
    val s = ctx.freshName("graftS")
    val i = ctx.freshName("graftI")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  $s += ${get(a, i, isFloat(left))} * ${get(b, i, isFloat(right))};
         |}
         |${ev.value} = $s;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration for graft's native functions. Idempotent. */
object GraftFunctions {
  val DotName = "graft_dot"
  val ByteDotName = "graft_byte_dot"
  val SimHashName = "graft_simhash64"
  val MinHashName = "graft_minhash_sig"
  val WindowMinName = "graft_window_min"
  val HilbertName = "graft_hilbert"

  // Once-per-session guard (weak keys: sessions stay collectable). Without
  // it every operator invocation re-registers and SimpleFunctionRegistry
  // logs a "replaced a previously registered function" warning per call —
  // hundreds of lines that drowned the bench headline three rounds running.
  private val registeredSessions: java.util.Set[SparkSession] =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = registeredSessions.synchronized {
    if (!registeredSessions.add(spark)) return
    // Optimizer rules ride the same once-per-session hook as functions.
    graft.plans.EditDistancePrefilter.install(spark)
    graft.plans.ApproxDistinctRewrite.install(spark)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(DotName,
      exprs => DotProductExpr(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(ByteDotName,
      exprs => ByteDotExpr(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(SimHashName,
      exprs => SimHash64Expr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(HilbertName,
      exprs => HilbertIndexExpr(exprs.head, exprs(1)), "built-in")
    // Signature length comes from Dedup.MinHashK — the single source of
    // the k/bands/rows shape (measured recall table: SCALE_NOTES Leg 2).
    reg.createOrReplaceTempFunction(MinHashName,
      exprs => MinHashSigExpr(exprs.head, graft.operators.Dedup.MinHashK), "built-in")
    // second arg must be a foldable int literal (the window width is a
    // plan-time constant, not per-row data)
    reg.createOrReplaceTempFunction(WindowMinName,
      exprs => WindowMinExpr(exprs.head, exprs(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$WindowMinName window width must be an integer literal, got $other")
      }), "built-in")
  }
}

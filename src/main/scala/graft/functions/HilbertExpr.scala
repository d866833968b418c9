package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Hilbert-curve index of a quantized 2-D
  * point — the space-filling-curve sibling of [[graft.sources.ZOrder]]'s
  * Morton interleave, used for multi-dimensional write clustering.
  *
  * Why Hilbert at all when Z-order already prunes both dims: the Morton
  * curve takes long diagonal jumps at power-of-two seams (…011→100…
  * flips every interleaved bit), so a contiguous curve segment — which is
  * exactly what one output file holds after the range-shuffle on the
  * index — can cover two far-apart rectangles. The Hilbert curve moves to
  * an ADJACENT cell at every step (provable from the construction: each
  * recursion level glues four quarter-curves end-to-end with rotations),
  * so a contiguous segment stays one compact blob and per-file min/max
  * footer stats enclose a tighter bounding box. HilbertSpec measures the
  * per-file range compression of both layouts on the same data.
  *
  * Why a custom Expression (builder-brief preference order (b)): the
  * encode is a 16-iteration state loop — rx/ry extraction, quadrant
  * accumulation, conditional flip+swap of (x, y). Folding it into Column
  * expressions duplicates the (x, y) subtrees at every level (the swap
  * branch references both), i.e. a ~3^16-node expression tree; a
  * `transform`/`aggregate` HOF formulation runs interpreted and boxed.
  * This expression generates the tight primitive loop inside whole-stage
  * codegen — same pattern and hygiene rules as [[DotProductExpr]].
  *
  * Algorithm: the standard iterative xy→d encode (Hilbert 1891 curve;
  * public-domain bit-twiddling form as on the Wikipedia "Hilbert curve"
  * page): walk s from the top bit down, accumulate the quadrant index
  * `s²·((3·rx) XOR ry)`, then rotate/reflect the lower bits into the
  * quadrant's frame.
  *
  * Inputs must already be quantized to `[0, 2^bits)` (the writer's
  * quantizer guarantees this); both engines' layouts stay comparable
  * because quantization — not the curve — fixes the cell grid.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  /** 16 bits/dim → 32-bit index: matches [[graft.sources.ZOrder.Bits]] so
    * the two curves cluster the identical cell grid. */
  val bits: Int = graft.sources.ZOrder.Bits

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val x = ctx.freshName("ghX"); val y = ctx.freshName("ghY")
    val d = ctx.freshName("ghD"); val s = ctx.freshName("ghS")
    val rx = ctx.freshName("ghRx"); val ry = ctx.freshName("ghRy")
    val t = ctx.freshName("ghT")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

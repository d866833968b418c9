package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native Catalyst expression: Σᵢ (codes[i] & 0xFF) · weights[i] over a
  * `binary` code column and an `array<double>` weight vector — the inner
  * loop of asymmetric-distance scoring against scalar-quantized (SQ8)
  * embeddings (operators/Sq8).
  *
  * Why a custom Expression (builder-brief preference order (b)): the
  * per-candidate work of an SQ8 scan IS this loop; a Scala UDF pays
  * boxing + array copy per row (the PQ scorer's shape), while this
  * generates a tight primitive loop inside whole-stage codegen over the
  * UnsafeRow bytes — the difference between a compute-bound and a
  * codegen-fused 100 TB index sweep. Sq8Spec pins equivalence against
  * the interpreted path.
  */
case class ByteDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Nullable regardless of child nullability — null weight elements
    * null-propagate (see DotProductExpr.nullable). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_byte_dot expects (binary, array<double>), got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val w = b.asInstanceOf[ArrayData]
    val n = math.min(codes.length, w.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (w.isNullAt(i)) return null
      s += (codes(i) & 0xFF) * w.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName, not fixed names — see DotProductExpr.doGenCode: duplicate
    // locals across two calls in one method silently kill codegen for the
    // whole projection.
    val n = ctx.freshName("graftN")
    val s = ctx.freshName("graftS")
    val i = ctx.freshName("graftI")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.length, $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  $s += ($a[$i] & 0xFF) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDotExpr =
    copy(left = newLeft, right = newRight)
}

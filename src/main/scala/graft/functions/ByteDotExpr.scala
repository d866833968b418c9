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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftN = java.lang.Math.min($a.length, $b.numElements());
         |double graftS = 0.0;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  if ($b.isNullAt(graftI)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  graftS += ($a[graftI] & 0xFF) * $b.getDouble(graftI);
         |}
         |${ev.value} = graftS;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDotExpr =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType}

import graft.SparkSuite

/** Regression: the native expressions must stay codegen-compilable when
  * the SAME expression appears several times in ONE generated method —
  * cosine alone expands graft_dot three times. With fixed local names the
  * generated Java redeclared `graftN` et al., javac failed, and Spark
  * silently demoted the whole projection to interpreted mode (only a WARN
  * betrayed it). GenerateUnsafeProjection.generate throws on a codegen
  * compile error, so this pins compilability directly. */
class CodegenHygieneSpec extends SparkSuite {

  test("repeated graft_dot calls compile in one projection") {
    val arr = BoundReference(0, ArrayType(DoubleType), nullable = false)
    val exprs = Seq(
      DotProductExpr(arr, arr),
      DotProductExpr(arr, arr),
      DotProductExpr(arr, arr))
    val proj = GenerateUnsafeProjection.generate(exprs) // throws if codegen fails
    assert(proj != null)
  }

  test("repeated graft_byte_dot calls compile in one projection") {
    val codes = BoundReference(0, BinaryType, nullable = false)
    val w = BoundReference(1, ArrayType(DoubleType), nullable = false)
    val proj = GenerateUnsafeProjection.generate(
      Seq(ByteDotExpr(codes, w), ByteDotExpr(codes, w)))
    assert(proj != null)
  }

  test("cosine projection stays inside whole-stage codegen end-to-end") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("c"),
        VectorOps.dot($"a", $"b").as("d"))
    val Seq((c, d)) = df.as[(Double, Double)].collect().toSeq
    assert(d === 11.0)
    assert(math.abs(c - 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))) < 1e-12)
  }
}

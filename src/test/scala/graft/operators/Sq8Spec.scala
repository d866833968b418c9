package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantized ANN: the native byte-dot expression against a
  * hand computation, and near-exact agreement of the 4×-compressed scan
  * with the float brute-force baseline. */
class Sq8Spec extends SparkSuite {

  import spark.implicits._

  test("graft_byte_dot matches the hand-computed sum; null element nulls out") {
    graft.functions.GraftFunctions.register(spark)
    val codes = Array[Byte](0, 127, -1) // unsigned: 0, 127, 255
    val df = Seq((codes, Seq(1.0, 2.0, 0.5))).toDF("c", "w")
    val got = df.select(graft.functions.VectorOps.byteDot($"c", $"w")).as[Double].head()
    assert(got === 0 * 1.0 + 127 * 2.0 + 255 * 0.5)
    val withNull = df.select(graft.functions.VectorOps.byteDot(
      $"c", typedlit(Seq[java.lang.Double](1.0, null, 2.0)))).as[Option[Double]].head()
    assert(withNull.isEmpty)
  }

  test("codes are 64 bytes; exact duplicate of the query attains cos 1") {
    val enc = Sq8.encodedOf(graft.Tables.embeddings(spark, Sf), Sf)
    val row = enc.select($"sq8_code", $"sq8_norm").head()
    assert(row.getAs[Array[Byte]](0).length === 64)
    assert(row.getDouble(1) > 0.0)
    // query vec 0 scored against its own codes: ADC cos of a vector with
    // itself-dequantized is 1 up to quantization error
    val qv = graft.Tables.embeddings(spark, Sf)
      .filter($"vec_id" === 0L).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val self = Sq8.knnSq8Of(
      graft.Tables.embeddings(spark, Sf).filter($"vec_id" === 0L)
        .withColumn("vec_id", lit(999999L)), Sf, qv, k = 1)
      .as[(Long, Int, Double)].head()
    assert(math.abs(self._3 - 1.0) < 0.001, s"self-cos ${self._3}")
  }

  test("sq8 top-10 agrees with the float brute-force scan") {
    val brute = Similarity.knnBrute(spark, Sf)
      .as[(Long, Int, Double)].collect().toSeq
    val sq8 = Sq8.knnSq8(spark, Sf)
      .as[(Long, Int, Double)].collect().toSeq
    assert(sq8.head._1 === brute.head._1) // same nearest neighbor
    val overlap = sq8.map(_._1).toSet.intersect(brute.map(_._1).toSet).size
    assert(overlap >= 8, s"top-10 overlap $overlap")
    // scores agree to ~8-bit precision
    val bruteCos = brute.map(r => r._1 -> r._3).toMap
    for ((id, _, c) <- sq8 if bruteCos.contains(id))
      assert(math.abs(c - bruteCos(id)) < 0.01, s"vec $id: $c vs ${bruteCos(id)}")
  }
}

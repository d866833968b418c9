package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass second-moment aggregator over a d-dim embedding column, with
  * every sum QUANTIZED to integers so the result is bit-identical under any
  * partitioning / shuffle order — the property that lets PCA (operators/Pca)
  * be golden-pinned AND recomputed independently by the DuckDB oracle.
  *
  * State layout (`Array[Long]`, length 1 + d + d(d+1)/2 ≈ 17 KB at d=64):
  *
  *   [0]                  n (row count)
  *   [1 .. d]             Σ floor(xᵢ · 1e8)                    (mean sums)
  *   [1+d ..]             Σ floor((xᵢ·xⱼ) · 1e8)  for i ≤ j    (moment sums,
  *                        upper triangle, row-major)
  *
  * Why integer quantization instead of plain double sums: a double
  * accumulation's low bits depend on merge order, and a 1e-12 wobble under
  * a 6-dp round is a hash-gate coin flip across 50k+ compared values.
  * `floor` on the double product is exact and engine-portable (DuckDB's
  * `floor` is the same IEEE operation), and Long sums are associative and
  * commutative EXACTLY, so partial aggregation, AQE re-partitioning, and
  * speculative re-execution all produce the same bits. Quantization biases
  * each moment by <1e-8 — three orders below the 6-dp report precision.
  *
  * Scale shape: this is an algebraic aggregate — partials combine map-side,
  * one ~17 KB buffer per task reaches the driver, nothing ever shuffles row
  * data. Long headroom: |x|≤8 ⇒ per-row |term| ≤ 6.4e9, safe past 1e9 rows;
  * a 100 TB corpus beyond that merges per-shard moments in BigInt on the
  * driver (same layout, wider adds).
  */
object CovarianceAggregator {

  val Scale = 1e8

  /** Index of the (i,j) moment sum (i ≤ j) in the state array. */
  def momentIdx(d: Int, i: Int, j: Int): Int =
    1 + d + i * d - (i * (i + 1)) / 2 + j

  def stateLen(d: Int): Int = 1 + d + d * (d + 1) / 2

  final class CovMoments(d: Int)
      extends Aggregator[Array[Float], Array[Long], Array[Long]] {

    override def zero: Array[Long] = new Array[Long](stateLen(d))

    override def reduce(b: Array[Long], row: Array[Float]): Array[Long] = {
      require(row.length == d, s"expected $d-dim vector, got ${row.length}")
      b(0) += 1L
      var i = 0
      while (i < d) {
        val xi = row(i).toDouble
        b(1 + i) += math.floor(xi * Scale).toLong
        var k = momentIdx(d, i, i)
        var j = i
        while (j < d) {
          b(k) += math.floor((xi * row(j).toDouble) * Scale).toLong
          k += 1
          j += 1
        }
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < a.length) { a(k) += b(k); k += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }
}

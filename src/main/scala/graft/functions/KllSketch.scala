package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KLL quantile sketch (Karnin, Lang & Liberty, "Optimal Quantile
  * Approximation in Streams", FOCS 2016) — the second quantile member of
  * the bounded-state sketch family, beside the t-digest
  * ([[TDigestAggregator]]) and HLL/CMS. Where the t-digest interpolates
  * between adaptive centroids, KLL keeps a hierarchy of COMPACTORS whose
  * items are real stored input values with power-of-two weights; its rank
  * error is uniform in q (the t-digest's is pinched at the tails), and —
  * the property this module exists for — its serialized form is a plain
  * `(value, level)` list that merges associatively, so a sketch can live
  * as a BINARY column in a continuously-maintained rollup cell and be
  * re-sliced to any grain (minute → day → total) without re-touching raw
  * rows, exactly like the HLL cells of
  * [[graft.streaming.Ingest.upsertSketchRollup]].
  *
  * Structure: level i holds items of weight 2^i. Level capacities decay
  * geometrically from the top (cap = max(2, ⌈k·(2/3)^depth⌉)), so total
  * state is O(k) ≈ 3k values REGARDLESS of input size. When the sketch
  * overflows, the lowest over-capacity level is sorted and every other
  * item is promoted to the next level at doubled weight (total weight is
  * preserved exactly; an odd leftover stays put). The paper flips a fair
  * coin per compaction to pick odd/even survivors; this implementation
  * derives the bit from a per-level alternation counter instead, making
  * the sketch DETERMINISTIC for a fixed input order — reproducibility the
  * oracle gate wants — at the price of the randomized worst-case bound
  * (for non-adversarial data the alternation is unbiased in aggregate;
  * KllSketchSpec measures the realized rank error across partitionings
  * and pins it ≤ 1%, and the registered queries carry a 2% rank-realized
  * guard on top, so a broken or biased sketch fails the gate rather than
  * an assumption).
  *
  * Like the t-digest, the exact sketch contents depend on merge order, so
  * raw estimates are not bitwise-reproducible across shuffle schedules;
  * registered queries follow the `agg_tdigest_check` pattern — exact
  * discrete quantiles recomputed independently by the oracle plus a
  * realized-rank bound flag — so the sketch is hash-gated every round
  * without a golden.
  */
object KllSketch {

  /** Default k: rank error well under 1% (the paper's constant ~1.65/√k
    * at 99% confidence gives ≈0.5% here; measured ≤0.6% on the test
    * corpora), state ≤ ~3k doubles ≈ 10 KB. */
  val DefaultK = 400

  /** Mutable sketch. `levels(i)` is an UNSORTED buffer of items with
    * weight 2^i (sorting happens at compaction/query time — each level is
    * ≤ ~k items, so the per-compaction sort is O(k log k) and per-row add
    * is amortized O(1)). */
  final class Sketch(val k: Int) extends Serializable {
    var levels: Array[Array[Double]] = Array(Array.empty)
    var n: Long = 0L
    /** Per-level alternation bits standing in for the paper's coin. */
    var flips: Array[Boolean] = Array(false)
    /** Insert buffer so per-row [[add]] is O(1) amortized (the level-0
      * array would otherwise be copied per row); drained into level 0
      * before any compaction, merge, query, or serialization. */
    private var buf: Array[Double] = new Array[Double](256)
    private var bufN: Int = 0

    private def flushBuf(): Unit = if (bufN > 0) {
      levels(0) = levels(0) ++ java.util.Arrays.copyOf(buf, bufN)
      bufN = 0
      compressIfNeeded()
    }

    private def capOf(i: Int, numLevels: Int): Int = {
      val depth = numLevels - 1 - i
      math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depth.toDouble)).toInt)
    }

    private def totalCap: Int =
      levels.indices.map(capOf(_, levels.length)).sum

    private def growTo(numLevels: Int): Unit = {
      if (levels.length < numLevels) {
        levels = levels ++ Array.fill(numLevels - levels.length)(Array.empty[Double])
        flips = flips ++ Array.fill(numLevels - flips.length)(false)
      }
    }

    def add(x: Double): Unit = {
      if (bufN == buf.length) flushBuf()
      buf(bufN) = x
      bufN += 1
      n += 1
    }

    def addAll(xs: Iterator[Double]): Unit = xs.foreach(add)

    private def compressIfNeeded(): Unit = {
      var total = levels.map(_.length).sum
      while (total > totalCap) {
        val i = levels.indices
          .find(i => levels(i).length >= capOf(i, levels.length))
          .getOrElse(-1)
        if (i < 0) return // all levels under cap ⇒ total ≤ totalCap − L; unreachable
        compactLevel(i)
        total = levels.map(_.length).sum
      }
    }

    /** Sort level i; promote every other item (alternating offset) to
      * level i+1 at doubled weight; an odd leftover keeps its level.
      * Total weight is preserved EXACTLY: each surviving pair member
      * carries its partner's weight. */
    private def compactLevel(i: Int): Unit = {
      growTo(i + 2)
      val sorted = levels(i).sorted
      val off = if (flips(i)) 1 else 0
      flips(i) = !flips(i)
      val pairs = sorted.length / 2
      val promoted = new Array[Double](pairs)
      var p = 0
      while (p < pairs) { promoted(p) = sorted(2 * p + off); p += 1 }
      levels(i) =
        if (sorted.length % 2 == 1) Array(sorted(sorted.length - 1))
        else Array.empty
      levels(i + 1) = levels(i + 1) ++ promoted
    }

    def mergeWith(o: Sketch): Sketch = {
      require(o.k == k, s"cannot merge KLL sketches with different k: $k vs ${o.k}")
      o.flushBuf()
      flushBuf()
      growTo(o.levels.length)
      var i = 0
      while (i < o.levels.length) {
        if (o.levels(i).nonEmpty) levels(i) = levels(i) ++ o.levels(i)
        i += 1
      }
      n += o.n
      compressIfNeeded()
      this
    }

    /** Discrete quantile: the STORED value whose cumulative weight first
      * reaches q·W — a real input value, never an interpolation (the same
      * discrete convention the rank-guard oracles use, so no .xx5
      * rounding seam between engines). */
    def quantile(q: Double): Double = {
      flushBuf()
      val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      if (items.isEmpty) return Double.NaN
      val sorted = items.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var j = 0
      while (j < sorted.length) {
        cum += sorted(j)._2
        if (cum >= target) return sorted(j)._1
        j += 1
      }
      sorted.last._1
    }

    def retainedItems: Int = { flushBuf(); levels.map(_.length).sum }

    /** Total weight held by the compactors — preserved exactly by
      * compaction and merge, so always equals [[n]] (asserted in spec). */
    def totalWeight: Long = {
      flushBuf()
      levels.indices.map(i => levels(i).length.toLong * (1L << i)).sum
    }

    def serialize(): Array[Byte] = {
      flushBuf()
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeLong(n)
      out.writeInt(levels.length)
      var i = 0
      while (i < levels.length) {
        out.writeBoolean(flips(i))
        out.writeInt(levels(i).length)
        levels(i).foreach(out.writeDouble)
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new Sketch(in.readInt())
    sk.n = in.readLong()
    val L = in.readInt()
    sk.levels = new Array[Array[Double]](L)
    sk.flips = new Array[Boolean](L)
    var i = 0
    while (i < L) {
      sk.flips(i) = in.readBoolean()
      val len = in.readInt()
      val arr = new Array[Double](len)
      var j = 0
      while (j < len) { arr(j) = in.readDouble(); j += 1 }
      sk.levels(i) = arr
      i += 1
    }
    sk
  }

  /** Quantile probes straight off a serialized sketch (rollup readout). */
  def quantilesOf(bytes: Array[Byte], qs: Seq[Double]): Seq[Double] = {
    val sk = deserialize(bytes)
    qs.map(sk.quantile)
  }

  /** values → quantile estimates (typed groupByKey path). */
  final class KllQuantiles(
      k: Int = DefaultK,
      probes: Seq[Double] = Seq(0.5, 0.9, 0.99))
    extends Aggregator[Double, Sketch, Seq[Double]] {
    override def zero: Sketch = new Sketch(k)
    override def reduce(s: Sketch, x: Double): Sketch = { s.add(x); s }
    override def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b)
    override def finish(s: Sketch): Seq[Double] = probes.map(s.quantile)
    override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** values → serialized sketch (the rollup-cell builder; liftable to an
    * untyped UDAF with `udaf(new KllFromValues(), Encoders.scalaDouble)`). */
  final class KllFromValues(k: Int = DefaultK)
    extends Aggregator[Double, Sketch, Array[Byte]] {
    override def zero: Sketch = new Sketch(k)
    override def reduce(s: Sketch, x: Double): Sketch = { s.add(x); s }
    override def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b)
    override def finish(s: Sketch): Array[Byte] = s.serialize()
    override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** serialized sketches → merged serialized sketch (the rollup-cell
    * merger and the any-grain re-slicer — KLL's `hll_union_agg`). */
  final class KllMergeAgg(k: Int = DefaultK)
    extends Aggregator[Array[Byte], Sketch, Array[Byte]] {
    override def zero: Sketch = new Sketch(k)
    override def reduce(s: Sketch, bytes: Array[Byte]): Sketch =
      s.mergeWith(deserialize(bytes))
    override def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b)
    override def finish(s: Sketch): Array[Byte] = s.serialize()
    override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch typed aggregator (Cormode/Muthukrishnan 2005): a
  * d×w counter matrix whose state size is CONSTANT in the input — the
  * frequency-estimation shape a 100 TB stream/table wants when exact
  * per-key counts (one shuffled row per distinct key) are too expensive.
  * Estimates are biased high only: est(x) ≥ true(x), and
  * est(x) ≤ true(x) + εN with probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Backed by Spark's own `org.apache.spark.util.sketch.CountMinSketch`
  * (the engine behind the SQL `count_min_sketch` aggregate), wrapped in a
  * typed Aggregator so it composes with groupByKey. The buffer is the
  * MUTABLE sketch object under a kryo encoder: updates are O(d) counter
  * increments per row, and serialization happens only at partial/merge
  * (shuffle) boundaries — merge is an elementwise counter add, associative
  * and commutative, so partials combine map-side like any algebraic
  * aggregate. Determinism: pure fixed-seed hashing — estimates do not
  * depend on row or merge order.
  */
object CountMinAggregator {

  /** eps=0.005, conf=0.99 → w=544, d=5: ~22 KB of state regardless of
    * input size. */
  final class CountMin(eps: Double = 0.005, conf: Double = 0.99, seed: Int = 42)
    extends Aggregator[String, CountMinSketch, Array[Byte]] {

    override def zero: CountMinSketch = CountMinSketch.create(eps, conf, seed)
    override def reduce(s: CountMinSketch, key: String): CountMinSketch = {
      // add as UTF8String bytes: matches how SQL count_min_sketch hashes
      s.add(UTF8String.fromString(key).getBytes)
      s
    }
    override def merge(s1: CountMinSketch, s2: CountMinSketch): CountMinSketch =
      s1.mergeInPlace(s2)
    override def finish(s: CountMinSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      s.writeTo(bos); bos.toByteArray
    }
    override def bufferEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Deserialize ONCE and return a query closure — callers estimating many
    * keys (a candidate sweep) must not re-parse the 22 KB sketch per key. */
  def estimator(sketch: Array[Byte]): String => Long =
    if (sketch.isEmpty) _ => 0L
    else {
      val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
      key => s.estimateCount(UTF8String.fromString(key).getBytes)
    }

  /** One-off single-key estimate (deserializes the sketch — use
    * [[estimator]] inside loops). */
  def estimate(sketch: Array[Byte], key: String): Long = estimator(sketch)(key)

  /** Executor-side estimator over a broadcast of the serialized sketch:
    * the task closure ships only the broadcast handle; the sketch is
    * deserialized lazily ONCE per deserialized closure (i.e. per task),
    * then every row scored against the decoded d×w matrix. This is the
    * scale-correct heavy-hitter readout — candidates scored distributed,
    * the driver receives only the top-k (EventOps.userCmsTopK). */
  final class BroadcastEstimator(
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]]) extends Serializable {
    @transient private lazy val est: String => Long = estimator(bc.value)
    def apply(key: String): Long = est(key)
  }
}

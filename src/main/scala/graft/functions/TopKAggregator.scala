package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator (builder-brief custom-aggregate path):
  * keeps only k (id, score) pairs per partial buffer, so a top-k over any
  * input size aggregates with O(k) state per task and O(k) shuffle bytes
  * per partition — the partial/merge shape `orderBy(...).limit(k)` gets
  * from TakeOrderedAndProject, but usable INSIDE an aggregation (e.g.
  * per-group top-k in one pass, where a window + filter would sort whole
  * partitions).
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)
  /** Product wrapper so the buffer/output use ExpressionEncoders (arrays of
    * case classes have no standalone Encoders.product). */
  final case class Buf(items: Seq[Scored])

  /** Deterministic order: score desc, id asc. */
  private def sortKeep(k: Int, items: Seq[Scored]): Seq[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)

  /** Generic over the input row type via an extractor — usable both on
    * Dataset[Scored] directly and inside groupByKey aggregations. */
  final class TopKBy[I](k: Int, f: I => Scored) extends Aggregator[I, Buf, Buf] {
    override def zero: Buf = Buf(Seq.empty)
    override def reduce(b: Buf, a: I): Buf =
      // keep the buffer bounded on every step — never accumulate the input
      Buf(sortKeep(k, b.items :+ f(a)))
    override def merge(b1: Buf, b2: Buf): Buf =
      Buf(sortKeep(k, b1.items ++ b2.items))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  final class TopK(k: Int) extends Aggregator[Scored, Buf, Buf] {
    private val by = new TopKBy[Scored](k, identity)
    override def zero: Buf = by.zero
    override def reduce(b: Buf, a: Scored): Buf = by.reduce(b, a)
    override def merge(b1: Buf, b2: Buf): Buf = by.merge(b1, b2)
    override def finish(r: Buf): Buf = by.finish(r)
    override def bufferEncoder: Encoder[Buf] = by.bufferEncoder
    override def outputEncoder: Encoder[Buf] = by.outputEncoder
  }
}

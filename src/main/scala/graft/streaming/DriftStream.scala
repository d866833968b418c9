package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Drift]]: per-minute PSI of a value
  * stream against a fixed reference distribution — the live tripwire in
  * front of the batch drift audit (alert on the stream, investigate with
  * the batch monitors).
  *
  * Shape: ONE windowed stateful aggregation whose state row per window is
  * the 10 conditional bin counts (no second stateful operator — the PSI
  * itself is a pure projection over the finalized row, so append mode +
  * watermark expiry work unchanged). At scale the bin counts partial-
  * aggregate map-side exactly like any streaming count; state size is
  * O(open windows), independent of event volume.
  *
  * The reference distribution arrives as driver-side counts (from
  * [[graft.operators.Drift.psiValueDrift]]'s window-a census or any
  * historical snapshot) and is folded into the projection as literals —
  * the same bounded-scalar idiom as BM25's corpus stats.
  */
object DriftStream {

  private val Bins = 10

  private def binCol: Column = least(floor(col("value") / 50.0), lit(9L))

  /** Per-closed-minute PSI vs `ref` (bin counts, length 10). Emits
    * (window_start, n_events, psi) once the watermark closes each window.
    * Laplace (+1) smoothing matches the batch monitor exactly. */
  def windowedPsi(events: DataFrame, ref: Seq[Long],
                  watermark: String = "2 minutes"): DataFrame = {
    require(ref.length == Bins, s"reference must have $Bins bin counts")
    val counts = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(
        sum(when(binCol === 0, 1L).otherwise(0L)).as("b0"),
        (1 until Bins).map(b =>
          sum(when(binCol === b, 1L).otherwise(0L)).as(s"b$b")): _*)
    val total = (0 until Bins).map(b => col(s"b$b")).reduce(_ + _)
    val refTotal = ref.sum.toDouble
    val psi = (0 until Bins).map { b =>
      val p = (col(s"b$b") + lit(1.0)) / (total + lit(10.0))
      val q = lit((ref(b) + 1.0) / (refTotal + 10.0))
      (p - q) * log(p / q)
    }.reduce(_ + _)
    counts.select(
      col("window.start").as("window_start"),
      total.as("n_events"),
      round(psi, 6).as("psi"))
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Audit]]: per-window data-quality
  * metrics on the live event stream — the tripwire that catches a bad
  * producer deploy (nulls spiking, enum garbage, out-of-range values)
  * minutes before the batch audit would, without a second pass over
  * anything.
  *
  * Shape: like [[DriftStream]], ONE windowed stateful aggregation — every
  * metric is an algebraic conditional count/min/max, so the per-window
  * state is a single bounded row regardless of event volume, partials
  * combine map-side, and append mode + watermark expiry work unchanged.
  * The verdict (`passed`) is a pure projection over the finalized row.
  *
  * At 100 TB/day this is the standard per-partition freshness/quality
  * dashboard feed: windows close with the watermark, each emitted row is
  * the quality certificate for that window, and the same constraint
  * suite runs batch-side (Audit) for backfills — one contract, two
  * runtimes.
  */
object AuditStream {

  private val ValidTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-closed-window constraint metrics over an events-shaped stream:
    * (window_start, n_rows, null_props, bad_type, neg_value, passed).
    * `passed` = zero violations in the window. */
  def windowedAudit(events: DataFrame,
                    watermark: String = "2 minutes",
                    window_ : String = "1 minute"): DataFrame = {
    val isBadType: Column = !col("event_type").isin(ValidTypes: _*)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
        sum(when(isBadType, 1L).otherwise(0L)).as("bad_type"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_value"))
      .select(
        col("window.start").as("window_start"),
        col("n_rows"), col("null_props"), col("bad_type"), col("neg_value"),
        (col("null_props") === 0 && col("bad_type") === 0 &&
          col("neg_value") === 0).as("passed"))
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming last-touch click attribution — the stream-stream JOIN surface
  * (SURVEY.md T10; the batch twins are operators/Temporal.asofClickAttribution
  * and Relational's range join, both oracle-checked).
  *
  * Two independent event streams (purchases, clicks) are joined on user
  * within an event-time interval — the canonical ad-tech correlation the
  * reference's single-topic pipeline never needs but any multi-stream
  * deployment does — then reduced to the LAST click per purchase.
  *
  * State stays bounded on an unbounded stream because BOTH sides carry
  * watermarks and the join condition bounds click age relative to the
  * purchase (`c_ts ∈ [p_ts − lookback, p_ts]`): Spark derives a state
  * eviction horizon for each side from the watermark + interval, so a
  * click is dropped from the join state once no future purchase can still
  * reach back to it. The downstream last-touch reduction is a second
  * stateful operator (windowed max_by keyed on the purchase) — legal in
  * one query since watermark propagation across stateful operators landed
  * in Spark 3.5; it finalizes each purchase's attribution exactly once,
  * in append mode, when the watermark passes its window.
  *
  * Scale shape: one shuffle per side on user_id for the join (state
  * co-partitioned), one shuffle on the purchase key for the reduction —
  * the same two-exchange plan the batch twin gets; nothing buffers
  * unboundedly and no driver collection anywhere.
  */
object Attribution {

  /** Join purchases to same-user clicks within `lookback` before the
    * purchase (inclusive; ties at the same µs break on the higher
    * click id — `max_by` over (c_ts, c_id)), last touch per purchase.
    *
    * Inputs are raw event streams with columns (event_id, user_id, ts).
    * Purchases with no click in the window are absent (inner interval
    * join) — the streaming-friendly contract; the batch as-of emits
    * NULL for them instead.
    *
    * Output: (event_id, user_id, last_click_id), finalized per purchase
    * once the watermark passes its `windowSize` bucket. */
  def lastTouch(
      purchases: DataFrame,
      clicks: DataFrame,
      lookback: String = "1 hour",
      watermark: String = "10 minutes",
      windowSize: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .groupBy(window(col("p_ts"), windowSize), col("p_id"), col("p_user"))
      .agg(max_by(col("c_id"), struct(col("c_ts"), col("c_id")))
        .as("last_click_id"))
      .select(col("p_id").as("event_id"), col("p_user").as("user_id"),
        col("last_click_id"))
  }

  /** [[lastTouch]] with LEFT OUTER interval-join semantics: every
    * purchase is emitted, clickless ones with a NULL `last_click_id` —
    * the batch as-of join's contract, now on the stream. The unmatched
    * row can only be declared once no future click can still land in its
    * lookback window, so Spark holds the purchase in join state until
    * the CLICK-side watermark passes `p_ts` (the interval bound gives
    * the engine that eviction horizon); the downstream windowed
    * reduction then finalizes it like any matched row. Same two
    * exchanges, same bounded state — the only cost of the outer contract
    * is emission latency tied to the watermark, not extra state.
    *
    * The conversion-RATE readout (attributed vs organic purchases per
    * window) needs exactly this: an inner join cannot count the
    * organic side. */
  def lastTouchOuter(
      purchases: DataFrame,
      clicks: DataFrame,
      lookback: String = "1 hour",
      watermark: String = "10 minutes",
      windowSize: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"),
        "left_outer")
      .groupBy(window(col("p_ts"), windowSize), col("p_id"), col("p_user"))
      .agg(max_by(col("c_id"), struct(col("c_ts"), col("c_id")))
        .as("last_click_id"))
      .select(col("p_id").as("event_id"), col("p_user").as("user_id"),
        col("last_click_id"))
  }
}

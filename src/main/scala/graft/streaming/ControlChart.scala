package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Timeseries.cusumHourly]]: the
  * one-sided CUSUM drift alarm running CONTINUOUSLY over the live event
  * stream — the control chart that pages when a rate shift has
  * accumulated, instead of waiting for the nightly batch audit.
  *
  * Shape: a windowed count (1 h tumbling, watermark-finalized) feeds a
  * `flatMapGroupsWithState` keyed on the series — the first stateful
  * operator closes buckets, the second folds them through the CUSUM
  * recursion (legal in one query since multi-stateful watermark
  * propagation landed in Spark 3.5; the same chaining as
  * [[Attribution.lastTouch]]). State per series is ONE double (the
  * running S⁺) — O(active series), independent of event volume.
  *
  * Order contract: the watermark advances monotonically, so buckets for
  * a key finalize in event-time order across micro-batches; within one
  * batch the fold sorts its buckets by hour. The recursion applies the
  * exact op sequence of the batch twin, so a stream fed the same events
  * emits the identical trajectory (ControlChartSpec pins this against an
  * independent recursion).
  *
  * Calibration (μ, σ) per series comes from the BATCH side — a control
  * chart is calibrated on history, then watches the present; computing σ
  * from the stream itself would let the drift poison its own threshold.
  */
object ControlChart {

  final case class CusumState(s: Double)

  /** One-sided CUSUM over finalized hourly buckets of `events`
    * (columns: event_type, ts). `params` maps series → (μ, σ) from the
    * batch calibration. Emits (event_type, hour, x, cusum_pos, alarm)
    * per closed bucket. */
  def cusumHourly(
      events: DataFrame,
      params: Map[String, (Double, Double)],
      watermark: String = "10 minutes"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val buckets = events
      .select(col("event_type"), col("ts"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("x"))
      .select(col("event_type"), col("window.start").as("hour"), col("x"))
    buckets.as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, (String, java.sql.Timestamp, Double, Double, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        val (mu, sigma) = params.getOrElse(key, (0.0, 1.0))
        val muK = mu + sigma / 2
        val sorted = rows.toSeq.sortBy(_._2.getTime)
        var sPos = state.getOption.map(_.s).getOrElse(0.0)
        val out = sorted.map { case (_, hr, x) =>
          // identical op order to the batch twin's fold
          sPos = math.max(0.0, sPos + x - muK)
          (key, hr, x, sPos, if (sPos > 4 * sigma) 1 else 0)
        }
        state.update(CusumState(sPos))
        out.iterator
      }
      .toDF("event_type", "hour", "x", "cusum_pos", "alarm")
  }
}

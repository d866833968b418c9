package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.KllSketch

/** KLL quantile-sketch queries — the mergeable-quantile complement to the
  * t-digest surface (EventOps.tdigestCheck). What KLL adds over the
  * t-digest is not accuracy but LIFECYCLE: its serialized form is a plain
  * binary cell that merges associatively with `KllMergeAgg`, so per-grain
  * sketches (minute cells) can be stored in a maintained view and
  * re-sliced to any coarser grain later — the quantile analog of the HLL
  * rollup ([[graft.streaming.Ingest.upsertSketchRollup]]); the streaming
  * maintained view is `Ingest.upsertQuantileRollup`, QuantileRollupSpec.
  *
  * Both queries are gated by the shared [[QuantileGuard]] harness (exact
  * discrete quantiles recomputed by DuckDB + a realized-rank ≤ 0.02 flag)
  * because sketch contents are merge-order-dependent — same reasoning as
  * the t-digest check, see QuantileGuard's Scaladoc.
  *
  * Scale shape: one hash shuffle on the grouping key; per-group state is
  * the O(k)-bounded sketch (~10 KB) with map-side partial merge, never
  * the group's raw values. The two-level query proves the 100 TB serving
  * pattern: build cells once at the fine grain, answer any coarser-grain
  * quantile question from the cells alone — the raw table is never
  * re-touched.
  */
object Kll {

  /** Per-type KLL estimates (event_type, e50, e90, e99) — direct build. */
  private def kllEstimates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kll = new KllSketch.KllQuantiles().toColumn.name("qs")
    Tables.events(s, d)
      .select($"event_type", $"value").na.drop()
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(kll)
      .map { case (et, qs) => (et, qs(0), qs(1), qs(2)) }
      .toDF("event_type", "e50", "e90", "e99")
  }

  /** Rank-guarded check of the directly-built per-type KLL sketch. */
  def kllCheck(s: SparkSession, d: String): DataFrame =
    QuantileGuard.check(s, d, kllEstimates(s, d))

  /** The mergeability proof, oracle-gated: build one serialized sketch
    * CELL per (event_type, minute) — the maintained-view grain — then
    * merge cells per type with `KllMergeAgg` and probe the MERGED sketch.
    * The guard passing certifies that quantiles served from rolled-up
    * cells are as good as a direct build, i.e. the minute→total re-slice
    * loses nothing beyond the sketch's own rank bound. */
  def kllRollupGrains(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kllVal = udaf(new KllSketch.KllFromValues(), Encoders.scalaDouble)
    val kllMerge = udaf(new KllSketch.KllMergeAgg(), Encoders.BINARY)
    val cells = Tables.events(s, d)
      .select($"event_type", date_trunc("minute", $"ts").as("m"), $"value")
      .na.drop()
      .groupBy($"event_type", $"m")
      .agg(kllVal($"value").as("sk"))
    val est = cells
      .groupBy($"event_type")
      .agg(kllMerge($"sk").as("sk"))
      .as[(String, Array[Byte])]
      .map { case (et, sk) =>
        val qs = KllSketch.quantilesOf(sk, Seq(0.5, 0.9, 0.99))
        (et, qs(0), qs(1), qs(2))
      }
      .toDF("event_type", "e50", "e90", "e99")
    QuantileGuard.check(s, d, est)
  }

  /** The report-grain readout (round-10 verdict #8): per (day ×
    * event_type) — the repo's flagship pivot grain (EventOps.pivotDayType)
    * — KLL latency-style quantiles of `value`, i.e. the p50/p90/p99 an
    * SRE dashboard wants BESIDE the count cells. Guarded per cell by
    * [[QuantileGuard.checkAt]]: exact discrete quantiles recomputed by
    * DuckDB + a tie-safe rank-interval flag with the 0.02 + 1/n bound
    * (day cells hold only tens-to-hundreds of values, where the sketch
    * serves the exact discrete quantile but a flat point-rank bound would
    * be tie-fragile). The facade twin over generated events is
    * [[graft.reference.MinuteReport.analyzeWithLatency]]. */
  def kllReportGrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kllVal = udaf(new KllSketch.KllFromValues(), Encoders.scalaDouble)
    val ev = Tables.events(s, d)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
        $"value".as("v"))
      .na.drop()
    val est = ev.groupBy($"day", $"event_type")
      .agg(kllVal($"v").as("sk"))
      .as[(String, String, Array[Byte])]
      .map { case (day, et, sk) =>
        val qs = KllSketch.quantilesOf(sk, Seq(0.5, 0.9, 0.99))
        (day, et, qs(0), qs(1), qs(2))
      }
      .toDF("day", "event_type", "e50", "e90", "e99")
    QuantileGuard.checkAt(s, ev, Seq("day", "event_type"), est)
  }

  val reportGrainOracle: String =
    """WITH r AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value,
      |         row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), event_type
      |                            ORDER BY value) AS rn,
      |         count(*) OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), event_type) AS n
      |  FROM events WHERE value IS NOT NULL)
      |SELECT day, event_type,
      |  max(CASE WHEN rn = ceil(CAST(0.5 AS DOUBLE) * n) THEN value END) AS p50_exact,
      |  max(CASE WHEN rn = ceil(CAST(0.9 AS DOUBLE) * n) THEN value END) AS p90_exact,
      |  max(CASE WHEN rn = ceil(CAST(0.99 AS DOUBLE) * n) THEN value END) AS p99_exact,
      |  CAST(1 AS INT) AS within_rank_bound
      |FROM r GROUP BY day, event_type ORDER BY day, event_type""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("agg_kll_check", Some(QuantileGuard.oracleSql), kllCheck),
    Q("agg_kll_rollup_grains", Some(QuantileGuard.oracleSql), kllRollupGrains),
    Q("agg_kll_report_grain", Some(reportGrainOracle), kllReportGrain))
}

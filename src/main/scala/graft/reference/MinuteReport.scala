package graft.reference

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship analysis (reference airflow/dags/spark.py:17-46,
  * 49-98): per-minute success/error report — groupBy(event_type) ×
  * pivot(status, [ERROR, SUCCESS]) × count, zero-filled, event_type-ordered,
  * wrapped in a JSON report document with the Tehran-timezone minute file
  * name (reference airflow/dags/pipeline.py:130-131).
  *
  * Differences from the reference, by design (SURVEY.md §7.4):
  *  - single pass: the reference runs 4 separate actions over a cached scan
  *    (count / pivot / sum / collect, spark.py:24-37); we collect the ≤5
  *    pivoted rows once and derive total_events and total_errors from the
  *    cells (A1 = Σ cells, A5 = Σ ERROR column) — same numbers, one job;
  *  - in-JVM report assembly, no Py4J / S3A hop.
  */
object MinuteReport {

  /** Report document (shape: reference dashboard/dashboard_api.py:27-46,
    * airflow/tests/common.py:23-37). */
  final case class Report(
      totalEvents: Long,
      totalErrors: Long,
      byEventType: Map[String, (Long, Long)], // type -> (SUCCESS, ERROR)
      processTime: Double,
      fileName: String,
      latencyMs: Option[(Double, Double, Double)] = None) // (p50, p90, p99)

  /** The explicit status domain of the reference pivot (spark.py:27-32).
    * Shared by [[pivotCounts]] and [[analyzeWithLatency]] so counts and
    * latency quantiles always cover the SAME rows. */
  val PivotStatuses: Seq[String] = Seq("ERROR", "SUCCESS")

  /** The pivot aggregation itself (reference spark.py:27-32): explicit
    * status value list, absent combos zero-filled, deterministic order. */
  def pivotCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .pivot("status", PivotStatuses)
      .count()
      .na.fill(0)
      .orderBy(col("event_type"))

  /** Restrict to one minute. Over a warehouse laid out with
    * `partitionBy("event_minute")` this is a metadata-only partition prune
    * (reference relies on ClickHouse minute partitioning the same way,
    * ARCHITECTURE.md:30). */
  def forMinute(events: DataFrame, minute: java.sql.Timestamp): DataFrame =
    events.filter(date_trunc("minute", col("event_timestamp")) === lit(minute))

  /** Build the full report in one pass over ≤5 pivoted rows. */
  def analyze(events: DataFrame, fileName: String, processTime: Double = 0.0): Report = {
    val rows = pivotCounts(events).collect()
    val byType = rows.map { r =>
      val err = r.getLong(r.fieldIndex("ERROR"))
      val suc = r.getLong(r.fieldIndex("SUCCESS"))
      r.getString(0) -> (suc, err)
    }.toMap
    val totalErrors = byType.values.map(_._2).sum
    val totalEvents = byType.values.map { case (s, e) => s + e }.sum
    Report(totalEvents, totalErrors, byType, processTime, fileName)
  }

  /** [[analyze]] plus the latency readout a real SRE dashboard wants
    * beside the counts: p50/p90/p99 of request_latency_ms over the same
    * minute, still ONE job — the pivot is desugared to a
    * groupBy(event_type, status) carrying a per-cell KLL sketch next to
    * each count, the ≤10 cell rows are collected once, and the counts
    * (zero-filled, explicit-status-list semantics exactly as
    * [[pivotCounts]]) and the minute-level quantiles (cell sketches
    * merged driver-side — KLL merge is associative, so cell→minute is
    * the same re-slice the warehouse rollup view serves) both come from
    * that single collect. The oracle-gated twin of this grain pattern is
    * `agg_kll_report_grain` (operators/Kll.scala); sketch accuracy and
    * tie-safe rank bounds are pinned by KllSketchSpec/QuantileRollupSpec. */
  def analyzeWithLatency(events: DataFrame, fileName: String,
      processTime: Double = 0.0): Report = {
    import org.apache.spark.sql.Encoders
    import graft.functions.KllSketch
    val kllVal = org.apache.spark.sql.functions.udaf(
      new KllSketch.KllFromValues(), Encoders.scalaDouble)
    val rows = events
      .groupBy(col("event_type"), col("status"))
      .agg(count(lit(1)).as("cnt"),
        kllVal(col("request_latency_ms").cast("double")).as("sk"))
      .collect()
    // counts: mirror pivotCounts' explicit value list — only the listed
    // statuses fill cells, but every event_type present appears (zero-
    // filled), and totals derive from the cells as in analyze()
    val byType = rows.groupBy(_.getString(0)).map { case (t, rs) =>
      def cnt(st: String) =
        rs.find(_.getString(1) == st).map(_.getAs[Long]("cnt")).getOrElse(0L)
      t -> (cnt("SUCCESS"), cnt("ERROR"))
    }
    val totalErrors = byType.values.map(_._2).sum
    val totalEvents = byType.values.map { case (s, e) => s + e }.sum
    // latency merges ONLY the cells whose status the counts cover
    // (PivotStatuses): without this, a status outside the explicit list
    // would feed the quantiles while total_events/total_errors exclude
    // it — a silent divergence the moment the status domain grows
    // (currently vacuous: generator and reference producer emit only
    // SUCCESS/ERROR, but the report must not depend on that)
    val listed = rows.filter(r => PivotStatuses.contains(r.getString(1)))
    val latency =
      if (listed.isEmpty) None
      else {
        val merged = listed
          .map(r => KllSketch.deserialize(r.getAs[Array[Byte]]("sk")))
          .reduce(_.mergeWith(_))
        if (merged.totalWeight == 0L) None
        else Some((merged.quantile(0.5), merged.quantile(0.9), merged.quantile(0.99)))
      }
    Report(totalEvents, totalErrors, byType, processTime, fileName, latency)
  }

  /** JSON serialization matching the reference report envelope
    * (spark.py:86-90: {"report": {...}}). Keys ordered deterministically. */
  def toJson(r: Report): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val types = r.byEventType.toSeq.sortBy(_._1).map { case (t, (s, e)) =>
      s""""${esc(t)}": {"SUCCESS": $s, "ERROR": $e}"""
    }.mkString("{", ", ", "}")
    // latency_ms is additive-only: the reference keys keep their exact
    // order and the block appears only when a latency readout was built
    // (analyzeWithLatency), so reference-shape consumers are unaffected
    val latency = r.latencyMs.map { case (p50, p90, p99) =>
      s""""latency_ms": {"p50": $p50, "p90": $p90, "p99": $p99}, """
    }.getOrElse("")
    s"""{"report": {"total_events": ${r.totalEvents}, "total_errors": ${r.totalErrors}, """ +
      s""""by_event_type": $types, $latency"process_time": ${r.processTime}, """ +
      s""""file_name": "${esc(r.fileName)}"}}"""
  }

  /** No-data sentinel (reference spark.py:69-73; airflow pipeline.py:162-164
    * returns an extension-less path when the minute had zero rows). */
  def noDataJson(name: String): String =
    s"""{"report": "No data for $name."}"""

  /** Path-driven entry mirroring reference spark.py main(): a path without
    * ".parquet" means "no data this minute" — skip analysis entirely. */
  def reportForPath(spark: SparkSession, path: String): String = {
    val name = path.split("/").last
    if (!name.contains("parquet")) noDataJson(name)
    else {
      val t0 = System.nanoTime()
      val df = spark.read.schema(Events.schema).parquet(path)
      val r = analyze(df, fileName = name)
      toJson(r.copy(processTime = (System.nanoTime() - t0) / 1e9))
    }
  }

  /** The reference's minute file naming quirk (pipeline.py:130-131, golden
    * test airflow/tests/test_integration_stream.py:122-140): trigger instant
    * → Asia/Tehran → floor to minute → minus 1 minute → yyyy-MM-dd_HH-mm. */
  def tehranMinuteFileName(triggerInstant: Instant): String = {
    import java.time.{ZoneId, Duration}
    import java.time.format.DateTimeFormatter
    val tehran = triggerInstant.atZone(ZoneId.of("Asia/Tehran"))
      .withSecond(0).withNano(0).minus(Duration.ofMinutes(1))
    tehran.format(DateTimeFormatter.ofPattern("yyyy-MM-dd_HH-mm")) + ".parquet"
  }
}

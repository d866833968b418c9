package graft

import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger

import graft.reference.Events

/** The orchestration contract (reference airflow/dags/pipeline.py:81-103):
  * retry count and delay, fail-fast skip, success/failure callbacks,
  * catchup=False interval selection, and the max_active_runs ceiling —
  * all driven with scripted failures and an injected sleep (no wall-clock
  * waits). */
class SchedulerSpec extends SparkSuite {
  import Scheduler._

  private def at(s: String): Instant = Instant.parse(s)

  test("runOnce: a transient failure is retried once after retry_delay and succeeds") {
    val calls = new AtomicInteger(0)
    val slept = Seq.newBuilder[Long]
    val flaky = Step("flaky", { _ =>
      if (calls.incrementAndGet() == 1) sys.error("transient"); "ok"
    })
    val rep = runOnce(at("2024-01-01T00:01:00Z"), Seq(flaky),
      sleep = slept += _)
    assert(rep.succeeded)
    assert(rep.steps == Seq(StepReport("flaky", 2, Succeeded, None)))
    // the reference's retry_delay: 3s, slept exactly once (before retry #1)
    assert(slept.result() == Seq(3000L))
  }

  test("runOnce: exhausted retries fail the run and fail-fast skips downstream tasks") {
    val downstream = new AtomicInteger(0)
    val failures = Seq.newBuilder[String]
    val rep = runOnce(
      at("2024-01-01T00:01:00Z"),
      Seq(Step("extract", _ => sys.error("boom")),
        Step("analyze", { _ => downstream.incrementAndGet(); "never" }),
        Step("report", { _ => downstream.incrementAndGet(); "never" })),
      sleep = _ => (),
      onFailure = r => failures += r.name)
    assert(!rep.succeeded)
    // retries=1 → exactly 2 attempts, then Failed with the error captured
    assert(rep.steps.head.attempts == 2)
    assert(rep.steps.head.status == Failed)
    assert(rep.steps.head.error.exists(_.contains("boom")))
    // Airflow's default all_success trigger rule: downstream tasks are
    // Skipped, never attempted
    assert(rep.steps.tail.map(_.status) == Seq(Skipped, Skipped))
    assert(downstream.get() == 0)
    // the failure callback fired for the failing task only
    assert(failures.result() == Seq("extract"))
  }

  test("runOnce: downstream skip does not depend on fail_fast (all_success trigger rule)") {
    val downstream = new AtomicInteger(0)
    val rep = runOnce(
      at("2024-01-01T00:01:00Z"),
      Seq(Step("extract", _ => sys.error("boom")),
        Step("analyze", { _ => downstream.incrementAndGet(); "never" })),
      cfg = Config(failFast = false),
      sleep = _ => ())
    assert(!rep.succeeded)
    assert(rep.steps.last.status == Skipped)
    assert(downstream.get() == 0,
      "a failed upstream must skip downstream even with fail_fast=False")
  }

  test("runOnce: success callback fires per task, in DAG order") {
    val order = Seq.newBuilder[String]
    val rep = runOnce(
      at("2024-01-01T00:01:00Z"),
      Seq(Step("a", _ => 1), Step("b", up => up.get.asInstanceOf[Int] + 1)),
      onSuccess = r => order += r.name)
    assert(rep.succeeded)
    assert(order.result() == Seq("a", "b"))
  }

  test("runOnce: upstream return value reaches the next task (XCom contract)") {
    val rep = runOnce(
      at("2024-01-01T00:01:00Z"),
      Seq(Step("produce", _ => "path/x.parquet"),
        Step("consume", up => "got:" + up.get)))
    assert(rep.succeeded)
  }

  test("dueIntervals: catchup=False schedules only the latest interval after downtime") {
    // last completed 00:01; scheduler wakes at 01:00:30 → 58 missed minutes
    val due = dueIntervals(
      Some(at("2024-01-01T00:01:00Z")), at("2024-01-01T01:00:30Z"),
      catchup = false)
    // only the latest completed interval (00:59 → 01:00) runs — no backfill
    assert(due == Seq(at("2024-01-01T00:59:00Z")))
  }

  test("dueIntervals: catchup=True backfills every missed minute") {
    val due = dueIntervals(
      Some(at("2024-01-01T00:56:00Z")), at("2024-01-01T01:00:30Z"),
      catchup = true)
    assert(due == Seq(at("2024-01-01T00:57:00Z"), at("2024-01-01T00:58:00Z"),
      at("2024-01-01T00:59:00Z")))
  }

  test("dueIntervals: nothing owed when the latest interval already ran") {
    assert(dueIntervals(Some(at("2024-01-01T00:59:00Z")),
      at("2024-01-01T01:00:30Z"), catchup = false).isEmpty)
    // first start (no history): the latest interval runs once
    assert(dueIntervals(None, at("2024-01-01T01:00:30Z"), catchup = false)
      == Seq(at("2024-01-01T00:59:00Z")))
  }

  test("runDue: at most max_active_runs runs are in flight") {
    val active = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val intervals = (0 until 6).map(i => at(f"2024-01-01T00:0$i:00Z"))
    val reports = runDue(
      intervals,
      iv => Seq(Step("work", { _ =>
        val now = active.incrementAndGet()
        peak.updateAndGet(p => math.max(p, now))
        Thread.sleep(50)
        active.decrementAndGet()
        iv.toString
      })),
      cfg = Config(maxActiveRuns = 2))
    assert(reports.size == 6 && reports.forall(_.succeeded))
    assert(reports.map(_.interval) == intervals) // reports in interval order
    assert(peak.get() <= 2, s"peak concurrency ${peak.get()} > max_active_runs 2")
    assert(peak.get() == 2, "pool never reached the allowed concurrency")
  }

  test("minutelySteps: extract→analyze→report over a real warehouse, with the no-data path") {
    val wh = tmpDir("graft-sched-wh")
    val landing = tmpDir("graft-sched-landing")
    val reportsDir = tmpDir("graft-sched-reports")

    // 2 minutes of events from 2024-01-01T00:00:00Z
    sources.Warehouse.writeEvents(
      Events.generate(spark, 12000, 1704067200000L, intervalMs = 10), wh)

    // interval start 00:01 reads the COMPLETED minute 00:00 (6000 rows) and
    // names it tehran(00:01 − 1min) = 03:30+3:30 — the reference's
    // data_interval_start − 1min convention (pipeline.py; pinned by its
    // test_integration_stream.py filename golden)
    val ok = runOnce(at("2024-01-01T00:01:00Z"),
      minutelySteps(spark, wh, landing, reportsDir, at("2024-01-01T00:01:00Z")))
    assert(ok.succeeded, ok)
    assert(ok.steps.map(_.name) == Seq("extract", "analyze", "report"))
    val landed = new java.io.File(landing).listFiles().map(_.getName).toSeq
    assert(landed == Seq("2024-01-01_03-30.parquet"), landed)
    val reportJson = sources.Warehouse.readReportJson(
      spark, s"$reportsDir/2024-01-01_03-30")
    assert(reportJson.contains(""""total_events": 6000"""), reportJson)
    // process_time reflects the actual pivot+collect, not lazy plan
    // construction (it can legitimately be small, but never exactly 0.0)
    assert(!reportJson.contains(""""process_time": 0.0,"""), reportJson)

    // same convention as the fused Pipeline.minutelyReport entry point
    val viaPipeline = Pipeline.minutelyReport(
      spark, wh, tmpDir("graft-sched-pipe"), at("2024-01-01T00:01:00Z"))
    assert(viaPipeline.contains(""""file_name": "2024-01-01_03-30.parquet""""),
      viaPipeline)
    assert(viaPipeline.contains(""""total_events": 6000"""), viaPipeline)

    // an empty minute takes the extension-less no-data path: nothing is
    // landed, the sentinel JSON is still reported
    val empty = runOnce(at("2024-01-01T09:00:00Z"),
      minutelySteps(spark, wh, landing, reportsDir, at("2024-01-01T09:00:00Z")))
    assert(empty.succeeded, empty)
    val sentinel = sources.Warehouse.readReportJson(
      spark, s"$reportsDir/2024-01-01_12-29")
    assert(sentinel == """{"report": "No data for 2024-01-01_12-29."}""", sentinel)
    assert(new java.io.File(landing).listFiles().map(_.getName).toSeq
      == Seq("2024-01-01_03-30.parquet"))
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.Events

/** Maintained contract monitor: cells must be exact additive counts —
  * two incremental upserts must serve the identical report to a one-shot
  * recompute over the union, planted corruption must land in exactly the
  * planted rule at the planted count, and the window filter must confine
  * the readout to the asked minutes.
  */
class ContractMonitorSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00 UTC

  private def cleanBatch(n: Int, startMs: Long): org.apache.spark.sql.DataFrame =
    Events.withEventMinute(Events.generate(spark, n, startMs))

  /** Hand-built rows, each breaking exactly one contract rule. */
  private def corruptBatch(startMs: Long): org.apache.spark.sql.DataFrame = {
    val u = "0123abcd-0000-4000-8000-0123456789ab"
    val ts = new Timestamp(startMs + 5000)
    val rows: Seq[(String, String, String, String, Timestamp, Int, String,
        Option[Int], Option[Int])] = Seq(
      // c1: bad event_id uuid (×2)
      ("nope", u, u, "SEARCH", ts, 100, "SUCCESS", None, None),
      ("also-bad", u, u, "SEARCH", ts, 100, "SUCCESS", None, None),
      // c4: latency out of range (×3)
      (u, u, u, "CHECKOUT", ts, 9999, "SUCCESS", None, None),
      (u, u, u, "CHECKOUT", ts, 9999, "SUCCESS", None, None),
      (u, u, u, "CHECKOUT", ts, 1, "SUCCESS", None, None),
      // c6: error_code present on SUCCESS (×1)
      (u, u, u, "PAYMENT", ts, 100, "SUCCESS", Some(500), None),
      // c7: product event without product_id (×1)
      (u, u, u, "VIEW_PRODUCT", ts, 100, "SUCCESS", None, None))
    Events.withEventMinute(rows.toDF("event_id", "user_id", "session_id",
        "event_type", "event_timestamp", "request_latency_ms", "status",
        "error_code", "product_id")
      .withColumn("error_code", col("error_code").cast("int"))
      .withColumn("product_id", col("product_id").cast("int")))
  }

  test("incremental cells == one-shot recompute; planted counts exact") {
    val dir = tmpDir("contract-monitor") + "/m"
    val clean = cleanBatch(2000, T0)
    val corrupt = corruptBatch(T0) // same first minute as the clean batch
    Ingest.upsertContractMonitor(clean, dir)
    Ingest.upsertContractMonitor(corrupt, dir)

    val served = Ingest.servedContractReport(spark, dir,
      T0, T0 + 3600000L).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap

    // one-shot recompute over the union with the same shared predicates
    val all = clean.unionByName(corrupt)
    val total = all.count()
    Ingest.ContractRules.foreach { case (rule, pred) =>
      val v = all.filter(pred).count()
      assert(served(rule)._1 == total, s"$rule checked")
      assert(served(rule)._2 == v, s"$rule violations: served ${served(rule)._2} vs $v")
      assert(served(rule)._3 == (v == 0L), s"$rule pass flag")
    }
    // the plant is where we put it — and nowhere else
    assert(served("c1_event_id_uuid")._2 == 2L)
    assert(served("c4_latency_in_range")._2 == 3L)
    assert(served("c6_error_code_iff_error")._2 == 1L)
    assert(served("c7_product_id_iff_product")._2 == 1L)
    assert(served("c2_user_id_uuid")._2 == 0L)
    assert(served("c3_type_in_domain")._2 == 0L)
    assert(served("c5_status_in_domain")._2 == 0L)
  }

  test("window filter confines the readout to the asked minutes") {
    val dir = tmpDir("contract-monitor-win") + "/m"
    // minute 0 clean, minute 10 corrupted
    Ingest.upsertContractMonitor(cleanBatch(500, T0), dir)
    Ingest.upsertContractMonitor(corruptBatch(T0 + 600000L), dir)

    val early = Ingest.servedContractReport(spark, dir, T0, T0 + 60000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(early.values.forall(_ == 0L), s"clean window must pass: $early")

    val late = Ingest.servedContractReport(spark, dir,
      T0 + 600000L, T0 + 660000L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(late("c1_event_id_uuid") == (7L, 2L))
    assert(late("c4_latency_in_range") == (7L, 3L))
  }

  test("clean generated traffic satisfies the producer contract") {
    val dir = tmpDir("contract-monitor-clean") + "/m"
    Ingest.upsertContractMonitor(cleanBatch(3000, T0), dir)
    val rows = Ingest.servedContractReport(spark, dir, T0, T0 + 3600000L).collect()
    assert(rows.length == Ingest.ContractRules.size)
    rows.foreach(r => assert(r.getBoolean(4),
      s"${r.getString(0)} must pass on clean traffic (${r.getLong(2)} violations)"))
  }
}

package graft.streaming

import java.net.InetSocketAddress
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.sun.net.httpserver.HttpServer

import graft.SparkSuite
import graft.reference.Events

/** S7 dashboard-parity: the REST report leg against an in-process HTTP
  * fixture, pinning the reference's send_to_dashboard error taxonomy
  * (airflow/tests/test_unit_report.py:33-139). */
class DashboardSpec extends SparkSuite {

  /** In-process dashboard API: records the last posted body, serves a
    * configurable status. */
  private def withServer(status: Int)(f: (String, AtomicReference[String], AtomicInteger) => Unit): Unit = {
    val received = new AtomicReference[String]("")
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/dashboard", exchange => {
      hits.incrementAndGet()
      received.set(new String(exchange.getRequestBody.readAllBytes(), "UTF-8"))
      exchange.sendResponseHeaders(status, -1)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/dashboard", received, hits)
    finally server.stop(0)
  }

  test("path munge matches the reference (.parquet -> .json, else append)") {
    assert(Dashboard.jsonPathFor("/x/2025-08-10_12-00.parquet") == "/x/2025-08-10_12-00.json")
    assert(Dashboard.jsonPathFor("/x/2025-08-10_12-00") == "/x/2025-08-10_12-00.json")
  }

  test("streaming leg posts each batch's minute report to the dashboard") {
    withServer(200) { (url, received, hits) =>
      val stage = tmpDir("dash-stage")
      val reports = tmpDir("dash-rep")
      val ckpt = tmpDir("dash-ckpt")
      Events.generate(spark, 2000, 1704067200000L, intervalMs = 10)
        .write.mode("overwrite").parquet(stage)
      val src = spark.readStream.schema(Events.schema).parquet(stage)
      Dashboard.startMinuteReportsToDashboard(src, reports, ckpt, url)
        .awaitTermination(120000)
      assert(hits.get() >= 1, "dashboard never received a report")
      val body = received.get()
      assert(body.nonEmpty)
      // posted body is the report object the JSON sink persisted
      val onDisk = graft.sources.Warehouse.readReportJson(
        spark, s"$reports/batch-0.json")
      assert(body == onDisk)
      assert(body.contains("\"file_name\""), s"unexpected report shape: $body")
    }
  }

  test("missing report -> ReportNotFound (reference S3Error case)") {
    withServer(200) { (url, _, hits) =>
      intercept[Dashboard.ReportNotFound](
        Dashboard.send(spark, tmpDir("dash-none") + "/nope.parquet", url))
      assert(hits.get() == 0, "must fail before any HTTP call")
    }
  }

  test("unparseable report -> ReportMalformed (reference JSONDecodeError case)") {
    withServer(200) { (url, _, hits) =>
      val dir = tmpDir("dash-bad")
      graft.sources.Warehouse.writeReportJson(spark, "not { json", s"$dir/r.json")
      intercept[Dashboard.ReportMalformed](Dashboard.send(spark, s"$dir/r.parquet", url))
      assert(hits.get() == 0, "must fail before any HTTP call")
    }
  }

  test("non-2xx response -> RequestFailed (reference raise_for_status case)") {
    withServer(500) { (url, _, _) =>
      val dir = tmpDir("dash-500")
      graft.sources.Warehouse.writeReportJson(spark, """{"ok":1}""", s"$dir/r.json")
      val ex = intercept[Dashboard.RequestFailed](
        Dashboard.send(spark, s"$dir/r.parquet", url))
      assert(ex.getMessage.contains("500"))
    }
  }

  test("connection failure -> RequestFailed (reference RequestException case)") {
    val dir = tmpDir("dash-conn")
    graft.sources.Warehouse.writeReportJson(spark, """{"ok":1}""", s"$dir/r.json")
    // nothing listens on this port
    intercept[Dashboard.RequestFailed](
      Dashboard.send(spark, s"$dir/r.parquet", "http://127.0.0.1:1/dashboard"))
  }
}

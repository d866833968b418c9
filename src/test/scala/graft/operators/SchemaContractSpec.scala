package graft.operators

import graft.SparkSuite

/** Data-contract gate: every rule's violation count must equal an
  * independent single-rule filter count, the pass flag must apply the
  * rule's tolerance (0 hard / 1% null-rate), and the readout must carry
  * both verdicts live on the real data (the generator plants invalid
  * user ids; the deliberately tight value bound catches the tail).
  */
class SchemaContractSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private lazy val rows =
    Audit.schemaContract(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap

  private lazy val ev = graft.Tables.events(spark, Sf).cache()

  // The session is shared across suites: a cached full-width events
  // relation would otherwise serve OTHER suites' plan asserts from an
  // InMemoryRelation (no parquet pruning/pushdown nodes) depending on
  // suite order. Drop the cache entry on the way out.
  override def afterAll(): Unit = {
    ev.unpersist(blocking = true)
    super.afterAll()
  }

  test("per-rule violation counts match independent filter recomputes") {
    val n = ev.count()
    val expect = Map(
      "r1_event_id_not_null" -> ev.filter($"event_id".isNull).count(),
      "r2_event_id_unique" -> (n - ev.select($"event_id").distinct().count()),
      "r3_user_id_valid" -> ev.filter($"user_id".isNull || $"user_id" <= 0).count(),
      "r4_type_in_domain" -> ev.filter($"event_type".isNull ||
        !$"event_type".isin("view", "click", "purchase", "signup", "error")).count(),
      "r5_value_in_range" -> ev.filter($"value" < 0 || $"value" > 400).count(),
      "r6_value_null_rate" -> ev.filter($"value".isNull).count(),
      "r7_ts_in_window" -> ev.filter($"ts".isNull ||
        $"ts" < "2024-01-01" || $"ts" >= "2027-01-01").count(),
      "r8_props_json_shape" -> ev.filter($"props".isNull ||
        !$"props".rlike("^\\{\"k\": -?[0-9]+\\}$")).count())
    assert(rows.keySet == expect.keySet, s"rule set: ${rows.keySet}")
    expect.foreach { case (rule, v) =>
      assert(rows(rule).getLong(2) == v, s"$rule violations")
      assert(rows(rule).getLong(1) == n, s"$rule checked")
    }
  }

  test("pass flags apply each rule's tolerance, both verdicts live") {
    rows.values.foreach { r =>
      val (rate, maxRate, pass) = (r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      assert(pass == (rate <= maxRate), s"${r.getString(0)} pass flag")
    }
    assert(rows("r6_value_null_rate").getDouble(4) == 0.01)
    assert(!rows("r3_user_id_valid").getBoolean(5),
      "generator's invalid user ids must FAIL the gate")
    assert(rows("r1_event_id_not_null").getBoolean(5))
  }

  test("scalar rules evaluate in one pass: single events scan, no Expand") {
    val plan = Audit.schemaContract(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "contract gate must not plan an Expand")
    // two legs = two scans (scalar + uniqueness), never one per rule
    val scans = "FileScan parquet".r.findAllIn(plan).length +
      "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 4, s"expected <= 2 scans of events (x2 count idioms), saw $scans:\n$plan")
  }
}

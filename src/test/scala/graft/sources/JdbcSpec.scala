package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** JDBC source against an in-process embedded Derby (the JDK-adjacent
  * database whose jars ship with Spark): predicate + projection pushdown
  * must reach the remote SQL — asserted via `PushedFilters` in the scan —
  * and the range-partitioned read must open N parallel slices. Derby
  * stands in for the reference's live-DBMS extract (pipeline.py:135-155);
  * the Spark-side code is identical for any JDBC database.
  */
class JdbcSpec extends SparkSuite {
  import spark.implicits._

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    System.setProperty("derby.system.home", tmpDir("derby-home")) // derby.log etc.
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      "CREATE TABLE events_ext (event_id INT PRIMARY KEY, event_type VARCHAR(20), latency_ms INT)")
    val ins = conn.prepareStatement("INSERT INTO events_ext VALUES (?, ?, ?)")
    (0 until 200).foreach { i =>
      ins.setInt(1, i)
      ins.setString(2, if (i % 3 == 0) "VIEW_PRODUCT" else "CHECKOUT")
      ins.setInt(3, (i * 37) % 500)
      ins.addBatch()
    }
    ins.executeBatch()
    conn.close()
  }

  test("filter and projection are pushed into the external database") {
    seeded
    val df = Jdbc.readTable(spark, url, "events_ext", driver)
      .filter($"LATENCY_MS" >= 250)
      .select($"EVENT_ID", $"LATENCY_MS")
    val plan = df.queryExecution.executedPlan.toString
    // the JDBC scan must carry the predicate (remote WHERE clause) and
    // read only the projected columns — not fetch-all-then-filter
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(LATENCY_MS,250)"), plan)
    assert(!plan.toLowerCase.contains("event_type"), plan)
    val got = df.as[(Int, Int)].collect().toSet
    val expect = (0 until 200).map(i => (i, (i * 37) % 500)).filter(_._2 >= 250).toSet
    assert(got == expect)
  }

  test("range-partitioned read opens N parallel slices with full coverage") {
    seeded
    val df = Jdbc.readTablePartitioned(spark, url, "events_ext", driver,
      partitionColumn = "EVENT_ID", lowerBound = 0L, upperBound = 200L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    // slicing must not lose or duplicate rows
    assert(df.count() == 200)
    assert(df.agg(sum($"LATENCY_MS")).head().getLong(0) ==
      (0 until 200).map(i => ((i * 37) % 500).toLong).sum)
  }
}

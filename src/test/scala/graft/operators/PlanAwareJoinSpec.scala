package graft.operators

import graft.SparkSuite

/** Advice→execution: every strategy the advisor can pick must produce a
  * result identical to the plain inner join, and the physical plan must
  * show the advisor's choice actually happened (broadcast exchange /
  * plain shuffle / salted composite key).
  */
class PlanAwareJoinSpec extends SparkSuite {
  import spark.implicits._

  private def leftDf(keys: Seq[String]) =
    keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "lv")
  private def rightDf(keys: Seq[String]) =
    keys.zipWithIndex.map { case (k, i) => (k, s"r$i") }.toDF("key", "rv")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq

  test("broadcast verdict executes as a broadcast join, result identical") {
    val l = leftDf(Seq.fill(60)("a") ++ (1 to 40).map("k" + _))
    val r = rightDf(Seq("a") ++ (1 to 40).map("k" + _))
    val j = Relational.planAwareJoin(l, r, "key", parallelism = 4,
      broadcastRows = 50)
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(sortedRows(j) == sortedRows(l.join(r, "key")))
  }

  test("skewed shuffle verdict executes salted, result identical") {
    // hot key: 400x3 = 1200 of 1250 output rows at parallelism 4 -> salt
    val l = leftDf(Seq.fill(400)("h") ++ (1 to 50).map("k" + _))
    val r = rightDf(Seq.fill(3)("h") ++ (1 to 50).map("k" + _))
    val j = Relational.planAwareJoin(l, r, "key", parallelism = 4,
      broadcastRows = 0)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"expected a salted join:\n$plan")
    assert(sortedRows(j) == sortedRows(l.join(r, "key")))
    assert(j.count() == 400L * 3 + 50)
  }

  test("filtered SELF-join (the advisor's motivating shape) executes cleanly") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, Sf)
    val l = ev.filter($"event_type" === "view").select($"user_id", $"value")
    val r = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts")
    val j = Relational.planAwareJoin(l, r, "user_id")
    assert(j.columns.toSeq == Seq("user_id", "value", "ts"))
    assert(j.count() == l.join(r, "user_id").count())
  }

  test("unskewed shuffle verdict stays a plain shuffle join, no salting") {
    val l = leftDf((1 to 200).map("k" + _))
    val r = rightDf((1 to 200).map("k" + _))
    val j = Relational.planAwareJoin(l, r, "key", parallelism = 4,
      broadcastRows = 0)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("__salt"), s"no salt expected:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a shuffle join:\n$plan")
    assert(sortedRows(j) == sortedRows(l.join(r, "key")))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Join-strategy advisor: the census numbers must equal exact recomputes
  * of the real join's cardinality, the strategy/salt rules must follow
  * their stated formulas, and — the readout→reality tie — a join the
  * advisor calls broadcast-able must actually plan as BroadcastHashJoin
  * under Spark's own defaults.
  */
class JoinPlanSpec extends SparkSuite {
  import spark.implicits._

  private def keyed(xs: Seq[String]) = xs.toDF("key")

  test("census equals the real join's exact output cardinality") {
    // hub key "h": 40 left x 25 right = 1000 output rows; plus 10 1:1 keys
    val left  = keyed(Seq.fill(40)("h") ++ (1 to 10).map("k" + _) ++ Seq("lonlyL"))
    val right = keyed(Seq.fill(25)("h") ++ (1 to 10).map("k" + _) ++ Seq("lonlyR"))
    val r = Audit.joinPlanFor(left, right, "planted", parallelism = 4,
      broadcastRows = 10).collect().head
    val realOut = left.join(right, "key").count()
    assert(r.getAs[Long]("left_rows") == 51 && r.getAs[Long]("right_rows") == 36)
    assert(r.getAs[Long]("matched_keys") == 11)
    assert(r.getAs[Long]("out_rows") == realOut, "census must equal the real join size")
    assert(r.getAs[Long]("out_rows") == 40L * 25 + 10)
    assert(r.getAs[Long]("max_key_out") == 1000L)
  }

  test("strategy + salt rules follow the stated formulas") {
    val left  = keyed(Seq.fill(40)("h") ++ (1 to 10).map("k" + _))
    val right = keyed(Seq.fill(25)("h") ++ (1 to 10).map("k" + _))
    // both sides exceed broadcastRows=10 -> shuffle; hub output 1000 of
    // 1010 rows >> evenshare 1010/4 -> salt ceil(1000*4/1010)=4
    val r = Audit.joinPlanFor(left, right, "planted", parallelism = 4,
      broadcastRows = 10).collect().head
    assert(r.getAs[String]("strategy") == "shuffle")
    assert(r.getAs[Long]("recommended_salt_factor") ==
      math.min(4L, (1000L * 4 + 1010 - 1) / 1010))
    assert(r.getAs[Boolean]("needs_salt"))
    // right side fits -> broadcast_right, salt moot (no shuffle to skew)
    val b = Audit.joinPlanFor(left, right, "planted", parallelism = 4,
      broadcastRows = 50).collect().head
    assert(b.getAs[String]("strategy") == "broadcast_right")
    assert(b.getAs[Long]("recommended_salt_factor") == 1L && !b.getAs[Boolean]("needs_salt"))
    // amplification = out/max(sides): 1010/50 = 20.2
    assert(math.abs(b.getAs[Double]("amplification") - 1010.0 / 50) < 1e-9)
  }

  test("disjoint key sets: zero output, factor 1, no salt") {
    val r = Audit.joinPlanFor(keyed(Seq("a", "b")), keyed(Seq("c")), "planted",
      parallelism = 4, broadcastRows = 0).collect().head
    assert(r.getAs[Long]("out_rows") == 0L && r.getAs[Long]("max_key_out") == 0L)
    assert(r.getAs[String]("strategy") == "shuffle")
    assert(r.getAs[Long]("recommended_salt_factor") == 1L && !r.getAs[Boolean]("needs_salt"))
    assert(r.getAs[Double]("amplification") == 0.0)
  }

  test("advisor's broadcast verdict matches Spark's own planner at defaults") {
    val rows = Audit.joinPlan(spark, Sf).collect()
      .map(r => r.getAs[String]("join_name") -> r).toMap
    val oc = rows("orders_customer")
    assert(oc.getAs[String]("strategy") == "broadcast_right",
      "customer (150 rows at sf0.001) must be called broadcast-able")
    // the real join Spark plans at default autoBroadcastJoinThreshold
    // broadcasts exactly the side the advisor picked
    val plan = graft.Tables.orders(spark, Sf)
      .join(graft.Tables.customer(spark, Sf),
        $"o_custkey" === $"c_custkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected a broadcast join:\n$plan")
    // FK->PK joins never amplify: out_rows == fact-side rows
    assert(oc.getAs[Long]("out_rows") == oc.getAs[Long]("left_rows"))
    assert(rows("lineitem_orders").getAs[Long]("out_rows") ==
      rows("lineitem_orders").getAs[Long]("left_rows"))
  }
}

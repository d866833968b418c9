package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Runtime bloom-filter join pruning: a selective filter on the dimension
  * side becomes a `might_contain` pre-filter on the fact side, dropping
  * fact rows before the join shuffle. The size thresholds default to
  * cluster scale (10 GB application side), so this spec lowers them to
  * make the injection fire on test data — the assert is about PLAN SHAPE,
  * which is scale-independent. */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dim filter injects a bloom filter on the fact side") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // broadcast would bypass the shuffle the bloom filter protects
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = Tables.orders(spark, Sf)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderdate")
      val fact = Tables.lineitem(spark, Sf)
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and it does not change the answer
      val expected = fact.join(
          Tables.orders(spark, Sf).filter($"o_orderpriority" === "1-URGENT")
            .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy($"l_returnflag").collect().toSeq
      assert(joined.orderBy($"l_returnflag").collect().toSeq == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the registered join_bloom_runtime query injects bloom and matches the plain join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "500MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    // the exact inner plan the registered query materializes, under the
    // same conf window the query itself opens
    val inner = try {
      val p = Relational.bloomJoinPlan(spark, Sf)
      assert(p.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "registered query's plan carries no runtime bloom filter")
      p.collect().toSeq
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    // the public query returns the same rows (bloom never drops a match)
    val queryRows = Relational.joinBloomRuntime(spark, Sf).collect().toSeq
    assert(queryRows == inner)
    val plain = Tables.lineitem(spark, Sf)
      .select($"l_orderkey",
        (expr("cast(round(l_extendedprice * 100) as bigint)") *
          expr("cast(round((1.0 - l_discount) * 100) as bigint)")).as("rev_e4"))
      .join(Tables.orders(spark, Sf).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, Sf).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nationkey"))
      .agg(sum($"rev_e4").as("urgent_revenue_e4"), count(lit(1)).as("n_lines"))
      .orderBy($"nationkey").collect().toSeq
    assert(queryRows == plain)
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, SparkEntry, Tables}
import graft.functions.VectorOps

/** Per-operator smoke + semantics checks at sf0.001. Oracle equivalence is
  * the driver's DuckDB gate (tools/check_oracle.py locally); these tests pin
  * engine-side semantics that the oracle can't see. */
class OperatorSpec extends SparkSuite {

  test("every query runs and is non-empty (except anti-join which may be empty)") {
    val mayBeEmpty = Set("join_anti_no_orders")
    SparkEntry.allDefs.foreach { q =>
      val n = q.fn(spark, Sf).count()
      assert(n >= 0)
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("no query plans a cartesian product or nested-loop join") {
    // The scale smell test: any BroadcastNestedLoopJoin or CartesianProduct
    // in the 100 TB posture is a bug (it was how the naive range join
    // planned before bucketing).
    SparkEntry.allDefs.foreach { q =>
      val plan = q.fn(spark, Sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name} has CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"${q.name} has BroadcastNestedLoopJoin")
    }
  }

  test("scans are column-pruned: 2-col projection reads a 2-col schema") {
    // SURVEY.md P1: the reference pushes its 9→2-column projection into the
    // warehouse; Catalyst must do the same into parquet.
    val plan = EventOps.filterProject(spark, Sf).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_id") && readSchema.contains("user_id") &&
      readSchema.contains("value") && !readSchema.contains("props"),
      s"projection not pruned: $readSchema")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q1 filter is pushed to the parquet scan") {
    val plan = Relational.q1PricingSummary(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("q3 broadcasts the customer dimension") {
    val plan = Relational.q3TopRevenue(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("shuffle_hash hint plans a ShuffledHashJoin") {
    val plan = Relational.joinShuffleHash(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("salted join: result equals the plain join; plan shuffles on (key, salt)") {
    import spark.implicits._
    val got = Relational.joinSkewSalted(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // plain unsalted reference join, same decimal-sum discipline
    val li = Tables.lineitem(spark, Sf)
    val plain = li
      .select(
        when($"l_orderkey" % 3 === 0, lit(1L)).otherwise($"l_suppkey").as("sk"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .join(Tables.supplier(spark, Sf).select($"s_suppkey".as("sk"), $"s_nationkey"), "sk")
      .groupBy($"s_nationkey")
      .agg(round(sum($"rev".cast("decimal(28,8)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("cnt"))
      .select($"s_nationkey".cast("long"), $"revenue", $"cnt")
      .orderBy($"s_nationkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === plain.toSeq)
    // the salted plan must not broadcast — the exchange carries the salt
    val plan = Relational.joinSkewSalted(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("salt"), plan)
  }

  test("topk plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.topKOrders(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("knnBrute finds the true nearest neighbors (validated in-memory)") {
    val rows = Tables.embeddings(spark, Sf).collect()
    val q = rows.find(_.getLong(0) == 0L).get.getSeq[Float](1)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val expected = rows.filter(_.getLong(0) != 0L)
      .map(r => (r.getLong(0), cos(q, r.getSeq[Float](1))))
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val got = Similarity.knnBrute(spark, Sf).collect().map(_.getLong(0))
    assert(got.toSeq == expected.toSeq)
  }

  test("Aggregator top-k matches brute-force kNN exactly") {
    val brute = Similarity.knnBrute(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val agg = Similarity.knnAggregator(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(agg == brute)
  }

  test("IVF kNN finds mostly the same neighbors as brute force") {
    val brute = Similarity.knnBrute(spark, Sf).collect().map(_.getLong(0)).toSet
    val ivf = Similarity.knnIvf(spark, Sf).collect().map(_.getLong(0)).toSet
    assert(ivf.size == 10)
    // approximate: require ≥40% overlap with ground truth at nProbe=4/16
    assert((brute & ivf).size >= 4, s"recall too low: ${(brute & ivf).size}/10")
  }

  test("VectorOps cosine of identical vectors is 1") {
    import spark.implicits._
    Tables.load(spark, Sf, "region") // ensure graft_dot is registered
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val c = df.select(VectorOps.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("native graft_dot agrees with the built-in HOF formulation") {
    val emb = Tables.embeddings(spark, Sf).limit(200)
    val both = emb.select(
      VectorOps.dot(col("embedding"), col("embedding")).as("native"),
      VectorOps.dotHof(col("embedding"), col("embedding")).as("hof"))
    // 1e-6 tolerance: the native expression multiplies in double while the
    // HOF multiplies floats, so the native result is slightly more precise
    val bad = both.filter(abs(col("native") - col("hof")) > 1e-6).count()
    assert(bad == 0)
    // and interpreted (no-codegen) path agrees exactly with codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = both.select(sum(col("native"))).head.getDouble(0)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = both.select(sum(col("native"))).head.getDouble(0)
      assert(interp == gen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("graft_dot handles nulls and length mismatch") {
    import spark.implicits._
    Tables.load(spark, Sf, "region")
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f, 9f))), // mismatched length: min-prefix
      (None, Some(Seq(1f, 1f)))                    // null -> null
    ).toDF("a", "b")
    val rows = df.select(VectorOps.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("ev_user_stats internal invariant: avg*cnt ≈ total (oracle-blind check)") {
    // Guards the bug class where Spark and oracle encode the SAME wrong
    // formula (the differential check passes on identical wrong numbers):
    // a cross-column invariant derived independently of either formula.
    EventOps.userStats(spark, Sf).collect().foreach { r =>
      val cnt = r.getLong(r.fieldIndex("cnt"))
      val total = r.getDouble(r.fieldIndex("total_value"))
      val avg = r.getDouble(r.fieldIndex("avg_value"))
      assert(math.abs(avg * cnt - total) < 0.01 * cnt, s"row $r")
    }
  }

  test("approx_count_distinct is within its error bound of exact") {
    import spark.implicits._
    val approx = Relational.aggApproxDistinct(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, Sf)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k approx=$a exact=$e")
    }
  }

  test("exact dedup keeps the minimal doc_id per text") {
    val dups = Dedup.exactDedup(spark, Sf)
    val total = Tables.documents(spark, Sf).select("text").distinct().count()
    assert(dups.count() == total)
  }

  test("range join matches a brute-force non-equi join") {
    import spark.implicits._
    val got = Temporal.rangeJoinPurchasesAfterView(spark, Sf)
    val ev = Tables.events(spark, Sf)
    val v = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts".as("vts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts".as("pts"))
    val brute = v.join(p,
        $"user_id" === $"p_user" && $"pts" > $"vts" &&
          $"pts" <= $"vts" + expr("INTERVAL 1 HOUR"), "left_outer")
      .groupBy($"view_id").agg(count($"purchase_id").as("purchases_1h"))
      .orderBy($"view_id")
    assert(got.collect().toSeq == brute.collect().toSeq)
  }

  test("batched decode: deterministic, full coverage, real dimensions") {
    val a = Multimodal.decodeImages(spark, Sf).collect()
    val b = Multimodal.decodeImages(spark, Sf, batchSize = 7).collect()
    assert(a.toSeq == b.toSeq) // batch size must not affect results
    assert(a.length == Tables.documents(spark, Sf).count())
    // decoded dimensions are the renderer's declared range — they came
    // back through the real PNG reader, not from metadata
    a.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      assert(w >= 16 && w <= 32 && h >= 16 && h <= 28, s"$w x $h")
    }
  }

  test("sketch expressions: single-element identities") {
    import spark.implicits._
    Tables.load(spark, Sf, "region") // ensure registration
    // SimHash of one hash h is h itself (every bit count is ±1)
    val h = 0x1234abcd5678ef90L
    val r = Seq(Tuple1(Seq(h))).toDF("hs")
      .select(call_function("graft_simhash64", col("hs")).as("sh"),
        call_function("graft_minhash_sig", col("hs")).as("sig"))
      .head()
    assert(r.getLong(0) == h)
    val sig = r.getSeq[Long](1)
    assert(sig.length == Dedup.MinHashK)
    // sig[k] = xxhash64(h, seed=k): deterministic and all-distinct here
    assert(sig.distinct.length == Dedup.MinHashK)
    val again = Seq(Tuple1(Seq(h))).toDF("hs")
      .select(call_function("graft_minhash_sig", col("hs"))).head().getSeq[Long](0)
    assert(sig == again)
  }

  test("simhash of identical docs is identical, hamming 0") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val hashed = Dedup.withSimhash(df).select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) == hashed(2L))
    assert(hashed(1L) != hashed(3L))
  }

  test("RFM quintiles are balanced and consistent with the underlying metrics") {
    val rows = EventPathOps.rfmSegments(spark, Sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // SQL NTILE balance: tile sizes differ by at most one
    for (c <- Seq(4, 5, 6)) {
      val sizes = rows.groupBy(_.getInt(c)).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"unbalanced tiles in col $c")
      assert(rows.map(_.getInt(c)).toSet.subsetOf((1 to 5).toSet))
    }
    // monotone: a strictly higher frequency never gets a strictly worse tile
    val byFreq = rows.sortBy(r => (-r.getLong(2), r.getLong(0)))
    byFreq.sliding(2).foreach { w =>
      if (w.length == 2 && w(0).getLong(2) > w(1).getLong(2))
        assert(w(0).getInt(5) <= w(1).getInt(5), s"${w(0)} vs ${w(1)}")
    }
    // segment string is exactly the three tile digits
    rows.foreach(r => assert(r.getString(7) ===
      s"${r.getInt(4)}${r.getInt(5)}${r.getInt(6)}"))
  }

  test("pareto profile: shares sum to 1, cumulative is monotone, deciles ordered") {
    val rows = EventPathOps.paretoProfile(spark, Sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    // first decile (most active) has the largest share; cum ends at 1
    val shares = rows.map(_.getDouble(3))
    assert(shares.head === shares.max)
    assert(math.abs(shares.sum - 1.0) < 2e-3) // 4-dp rounding dust
    val cums = rows.map(_.getDouble(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(math.abs(cums.last - 1.0) < 1e-9)
    // total events conserved
    assert(rows.map(_.getLong(2)).sum ===
      graft.Tables.events(spark, Sf).count())
  }

  test("markov transition matrix counts per-user successions; rows sum to 1") {
    import spark.implicits._
    val rows = EventPathOps.markovTransitions(spark, Sf).collect()
    assert(rows.nonEmpty)
    // row-conditional probabilities sum to ~1 per current type
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-4, s"type $t row sums to $total")
    }
    // total transitions = total events minus one per user with >=1 event
    val ev = graft.Tables.events(spark, Sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }
}

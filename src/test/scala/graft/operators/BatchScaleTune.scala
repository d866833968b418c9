package graft.operators

import org.apache.spark.sql.functions._

/** SCALE_NOTES Leg 10 measurement (run manually, results recorded there):
  * the round-5 fourth batch at 20× sf0.1.
  *
  * Blow-up constructions chosen so each operator has an EXACT expected
  * output at scale (asserted), making the timing numbers evidence about
  * plan shape, not noise:
  *  - documents ×20 with ids shifted and TEXT UNCHANGED → classifier
  *    output rows scale ×20 and per-copy logits are identical;
  *  - customer ×20 with ids shifted by multiples of 7×10^5 → custkey%7
  *    is preserved, so SCD-2 branch sizes scale exactly ×20;
  *  - part ×20 (ids shifted, names unchanged) → the fuzzy join's DISTINCT
  *    entity vocabulary is UNCHANGED, so its output must be IDENTICAL and
  *    its wall-time ~flat — the entity-vocabulary bound in action;
  *  - events ×20 as plain unioned copies (same minutes, so every observed
  *    minute sum scales ×20) → gap-fill grid stays 7,200 rows
  *    (spine-bounded) while the observed aggregation scans 20× the rows.
  */
object BatchScaleTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val copies = 20

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[batchscale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // --- classifier over 20× docs (text unchanged) ---
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val bigDocs = (0 until copies).map { i =>
      docs.select(($"doc_id" + lit(i.toLong * 1000000L)).as("doc_id"),
        $"text", $"lang", $"source", $"n_chars")
    }.reduce(_ union _).localCheckpoint()
    val nDocs = bigDocs.count()
    val base = Classifier.qualityClassifierOf(docs)
      .agg(count(lit(1)), sum(when($"accepted", 1L).otherwise(0L))).head()
    val big = timed("classifier 20x") {
      Classifier.qualityClassifierOf(bigDocs)
        .agg(count(lit(1)), sum(when($"accepted", 1L).otherwise(0L))).head()
    }
    assert(big.getLong(0) == copies * base.getLong(0), "rows must scale x20")
    assert(big.getLong(1) == copies * base.getLong(1), "accepts must scale x20")

    // --- chi2 over the same 20× docs: statistic scales ×20 exactly
    // (every cell count and marginal is ×20: (20O-20E)²/20E = 20·(O-E)²/E)
    val chiBase = Drift.chi2Of(docs).head().getDouble(0)
    val chiBig = timed("chi2 20x")(Drift.chi2Of(bigDocs).head().getDouble(0))
    assert(math.abs(chiBig - copies * chiBase) < 0.05, s"$chiBig vs 20*$chiBase")

    // --- scd2 over 20× customers (custkey%7 preserved) ---
    val cust = graft.Tables.customer(spark, "/root/testdata/sf0.1")
    val bigCust = (0 until copies).map { i =>
      cust.select(($"c_custkey" + lit(i.toLong * 700000L)).as("c_custkey"),
        $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment")
    }.reduce(_ union _).localCheckpoint()
    val scdBase = EntityRes.scd2UpsertOf(cust).count()
    val scdBig = timed("scd2 20x")(EntityRes.scd2UpsertOf(bigCust).count())
    assert(scdBig == copies * scdBase, s"$scdBig vs 20*$scdBase")

    // --- fuzzy join over 20× parts (names unchanged → IDENTICAL output) ---
    val part = graft.Tables.part(spark, "/root/testdata/sf0.1")
    val bigPart = (0 until copies).map { i =>
      part.select(($"p_partkey" + lit(i.toLong * 1000000L)).as("p_partkey"),
        $"p_name", $"p_brand", $"p_type", $"p_size", $"p_retailprice")
    }.reduce(_ union _).localCheckpoint()
    val fzBase = EntityRes.fuzzyJoinBlockedOf(part).collect().toSeq
    val fzBig = timed("fuzzy 20x")(EntityRes.fuzzyJoinBlockedOf(bigPart).collect().toSeq)
    assert(fzBig == fzBase, "entity-vocabulary bound: output must be identical")

    // --- audit over 20× orders ---
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.1")
    val bigOrders = (0 until copies).map { i =>
      orders.select(($"o_orderkey" + lit(i.toLong * 100000000L)).as("o_orderkey"),
        $"o_custkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate", $"o_orderpriority")
    }.reduce(_ union _).localCheckpoint()
    val auBig = timed("audit 20x")(Audit.auditOf(bigOrders).collect())
    assert(auBig.length == 5 && auBig.forall(_.getBoolean(2)), "clean at 20x")

    // --- gapfill over 20× events (same minutes; grid stays spine-bounded) ---
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val bigEv = (0 until copies).map { i =>
      ev.select($"event_type", $"ts", $"value")
    }.reduce(_ union _).localCheckpoint()
    println(s"[batchscale] events=${bigEv.count()}")
    val gfBase = Timeseries
      .gapfillInterpolateOf(ev.select($"event_type", $"ts", $"value"),
        "2024-01-05 00:00:00", "2024-01-05 23:59:00").count()
    val gfBig = timed("gapfill 20x") {
      Timeseries.gapfillInterpolateOf(bigEv,
        "2024-01-05 00:00:00", "2024-01-05 23:59:00").count()
    }
    assert(gfBig == gfBase, "grid is spine-bounded, not data-bounded")

    println("[batchscale] all scale invariants hold")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Ground-truth specs for the round-5 fourth batch: gap-fill
  * interpolation, the constraint audit, blocked fuzzy matching, SCD-2
  * merge, and the hashed linear classifier. Each oracle-checked query
  * also gets an independent hand-computed check here (the oracle proves
  * cross-engine agreement; these prove the semantics are the intended
  * ones, on inputs small enough to verify by hand).
  */
class BatchOpsSpec extends SparkSuite {

  test("gapfill: grid is dense, observed rows exact, gaps linearly interpolated") {
    import spark.implicits._
    val out = Timeseries.gapfillInterpolate(spark, Sf).cache()
    // dense grid: |types| × 1440 minutes, no holes
    val types = out.select($"event_type").distinct().count()
    assert(out.count() == types * 1440)
    // observed rows carry the exact minute sum
    val obs = graft.Tables.events(spark, Sf)
      .filter($"ts" >= "2024-01-05" && $"ts" < "2024-01-06")
      .groupBy($"event_type", date_trunc("minute", $"ts").as("minute"))
      .agg(round(sum($"value".cast("decimal(28,8)")).cast("double")
        .cast("decimal(28,8)"), 4).cast("double").as("v"))
    val joined = out.filter($"observed").join(obs, Seq("event_type", "minute"))
    assert(joined.count() == out.filter($"observed").count())
    assert(joined.filter($"v_filled" =!= $"v").count() == 0)
    // every gap value lies within [min, max] of its series' observations
    // (linear interpolation + endpoint carry can never extrapolate)
    val bounds = obs.groupBy($"event_type")
      .agg(min($"v").as("lo"), max($"v").as("hi"))
    val oob = out.filter(!$"observed").join(bounds, "event_type")
      .filter($"v_filled" < $"lo" || $"v_filled" > $"hi")
    assert(oob.count() == 0)
    out.unpersist()
  }

  test("gapfill: hand-built series — endpoint carry and linear midpoints") {
    import spark.implicits._
    // observations at 10:00 (v=10) and 10:04 (v=30); spine 09:58..10:06
    val ev = Seq(
      ("a", "2024-01-05 10:00:30", 4.0),
      ("a", "2024-01-05 10:00:40", 6.0),   // same minute: sums to 10
      ("a", "2024-01-05 10:04:10", 30.0))
      .toDF("event_type", "tss", "value")
      .select($"event_type", $"tss".cast("timestamp").as("ts"), $"value")
    val out = Timeseries
      .gapfillInterpolateOf(ev, "2024-01-05 09:58:00", "2024-01-05 10:06:00")
      .collect()
      .map(r => r.getTimestamp(1).toString.substring(11, 16) -> r.getDouble(2))
      .toMap
    assert(out.size == 9)
    assert(out("09:58") == 10.0 && out("09:59") == 10.0) // left carry
    assert(out("10:00") == 10.0 && out("10:04") == 30.0) // observed
    assert(out("10:01") == 15.0 && out("10:02") == 20.0 && out("10:03") == 25.0)
    assert(out("10:05") == 30.0 && out("10:06") == 30.0) // right carry
  }

  test("seasonal decompose: residuals recompute from raw counts and sum to ~0 per (type, hod)") {
    import spark.implicits._
    val out = Timeseries.seasonalDecompose(spark, Sf).localCheckpoint()
    // exact integer identities: seasonal_milli = 1000*ssum/scnt truncated,
    // resid_milli = 1000*(x*scnt-ssum)/scnt truncated — recompute per group
    val rows = out.select($"event_type", $"hod", $"x", $"scnt",
      $"seasonal_milli", $"resid_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byGroup = rows.groupBy(r => (r._1, r._2))
    byGroup.foreach { case ((_, _), g) =>
      val ssum = g.map(_._3).sum
      val scnt = g.length.toLong
      g.foreach { case (et, hod, x, sc, seas, res) =>
        assert(sc === scnt, s"($et,$hod) scnt")
        assert(seas === 1000L * ssum / scnt)
        assert(res === 1000L * (x * scnt - ssum) / scnt)
      }
      // truncated residuals of a group sum to within scnt millis of zero
      val total = g.map(_._6).sum
      assert(math.abs(total) < 1000L * scnt, s"residual drift: $total")
    }
    assert(byGroup.nonEmpty)
  }

  test("seasonal anomaly: exactly the >=50%-deviation rows of the decomposition") {
    import spark.implicits._
    val dec = Timeseries.seasonalDecompose(spark, Sf)
      .select($"event_type", $"hour", $"resid_milli", $"seasonal_milli")
      .as[(String, String, Long, Long)].collect()
    val expect = dec.filter { case (_, _, r, se) => math.abs(r) * 2 >= se }
      .map(t => (t._1, t._2)).toSet
    val got = Timeseries.seasonalAnomaly(spark, Sf)
      .select($"event_type", $"hour").as[(String, String)].collect().toSet
    assert(got === expect)
    // the rule must fire on some hours and not on all hours
    assert(got.nonEmpty && got.size < dec.length)
  }

  test("ewma: closed form equals the textbook recursion on a hand series") {
    import spark.implicits._
    // x = [1, 3, 2, 6]: s1=1, s2=.5*3+.5*1=2, s3=.5*2+.5*2=2, s4=.5*6+.5*2=4
    val hourly = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 3.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 2.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 6.0))
      .toDF("event_type", "hour", "x")
    val got = Timeseries.ewmaHourlyOf(hourly)
      .select($"t", $"ewma").as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 4.0))
    // and against an independent recursion on a longer pseudo-random series
    val xs = (1 to 80).map(i => (i * 37 % 11).toDouble)
    val longSeries = xs.zipWithIndex.map { case (x, i) =>
      ("b", new java.sql.Timestamp(1704067200000L + i * 3600000L), x)
    }.toDF("event_type", "hour", "x")
    var sRef = xs.head
    val want = xs.head +: xs.tail.map { x => sRef = 0.5 * x + 0.5 * sRef; sRef }
    val gotLong = Timeseries.ewmaHourlyOf(longSeries)
      .orderBy($"t").select($"ewma").as[Double].collect()
    want.zip(gotLong).zipWithIndex.foreach { case ((w, g), i) =>
      assert(math.abs(w - g) < 5e-4, s"t=${i + 1}: want $w got $g")
    }
  }

  test("cusum: sustained shift accumulates and alarms; a spike decays") {
    import spark.implicits._
    // series: 20 quiet hours at 10, then 6 shifted hours at 20.
    // mu ≈ 12.31, sigma ≈ 4.21 → k ≈ 2.11, h = 4σ ≈ 16.9;
    // quiet drift ≈ −4.42/hour (clamped at 0), shifted ≈ +5.58/hour →
    // S crosses h during the shift's 4th hour and stays up.
    val xs = Seq.fill(20)(10.0) ++ Seq.fill(6)(20.0)
    val hourly = xs.zipWithIndex.map { case (x, i) =>
      ("a", new java.sql.Timestamp(1704067200000L + i * 3600000L), x)
    }.toDF("event_type", "hour", "x")
    val got = Timeseries.cusumHourlyOf(hourly)
      .select($"t", $"cusum_pos", $"alarm").as[(Long, Double, Int)]
      .collect().sortBy(_._1)
    // independent recursion
    val n = xs.length
    val mu = xs.sum / n
    val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / n)
    var sref = 0.0
    val want = xs.map { x =>
      sref = math.max(0.0, sref + x - (mu + sigma / 2)); sref
    }
    got.zip(want).foreach { case ((t, s, _), w) =>
      assert(math.abs(s - w) < 5e-4, s"t=$t: got $s want $w")
    }
    // quiet phase never alarms; the sustained shift eventually does
    assert(got.take(20).forall(_._3 == 0), "false alarm in the quiet phase")
    assert(got.last._3 == 1, "sustained shift failed to alarm")
  }

  test("holt: level tracks a linear ramp and trend converges to its slope") {
    import spark.implicits._
    // x_t = 2t: a pure linear ramp — Holt's trend must converge to 2 and
    // the one-step forecast to x_{t+1}
    val xs = (1 to 40).map(i => 2.0 * i)
    val hourly = xs.zipWithIndex.map { case (x, i) =>
      ("a", new java.sql.Timestamp(1704067200000L + i * 3600000L), x)
    }.toDF("event_type", "hour", "x")
    val got = Timeseries.holtTrendHourlyOf(hourly)
      .select($"t", $"level", $"trend", $"forecast")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    // independent recursion
    var l = xs.head; var b = 0.0
    val want = xs.zipWithIndex.map { case (x, i) =>
      if (i > 0) { val lp = l; l = (x + (l + b)) / 2; b = ((l - lp) + b) / 2 }
      (l, b, l + b)
    }
    got.zip(want).foreach { case ((t, lg, bg, fg), (lw, bw, fw)) =>
      assert(math.abs(lg - lw) < 5e-4 && math.abs(bg - bw) < 5e-4 &&
        math.abs(fg - fw) < 5e-4, s"t=$t: got ($lg,$bg,$fg) want ($lw,$bw,$fw)")
    }
    // convergence: by t=40 trend ≈ slope 2, forecast ≈ x_41 = 82
    assert(math.abs(got.last._3 - 2.0) < 0.05, s"trend ${got.last._3} !≈ 2")
    assert(math.abs(got.last._4 - 82.0) < 0.2, s"forecast ${got.last._4} !≈ 82")
  }

  test("heaps curve: totals, monotonicity, and front-loaded vocabulary") {
    import spark.implicits._
    val rows = TextOps.heapsLaw(spark, Sf)
      .select($"bucket", $"tokens_new", $"vocab_new", $"tokens_cum", $"vocab_cum")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 to 9))
    // cum columns really are running sums
    assert(rows.map(_._2).sum == rows.last._4)
    assert(rows.map(_._3).sum == rows.last._5)
    // totals agree with independent corpus-wide counts
    val tok = graft.Tables.documents(spark, Sf).select(
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
    assert(rows.last._4 == tok.count())
    assert(rows.last._5 == tok.distinct().count())
    // Heaps: the first bucket introduces the most new words, and the
    // cumulative vocabulary is strictly monotone
    assert(rows.head._3 == rows.map(_._3).max)
    assert(rows.map(_._5).toSeq == rows.map(_._5).sorted.toSeq)
  }

  test("audit: clean table passes every constraint; violations are caught") {
    import spark.implicits._
    val clean = Audit.auditOrders(spark, Sf).cache()
    assert(clean.count() == 5)
    assert(clean.filter(!$"passed").count() == 0)
    // break completeness, uniqueness, range and enum in a 4-row fixture
    val dirty = Seq(
      (1L, Some(10L), "O", 50.0),
      (1L, Some(11L), "F", -2.0),      // dup key + negative price
      (2L, None, "X", 10.0),           // null custkey + bad enum
      (3L, Some(12L), "P", 30.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val rep = Audit.auditOf(dirty).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(!rep("uniqueness_o_orderkey")._2 && rep("uniqueness_o_orderkey")._1 == 0.75)
    assert(!rep("completeness_o_custkey")._2 && rep("completeness_o_custkey")._1 == 0.75)
    assert(!rep("compliance_positive_price")._2)
    assert(!rep("compliance_status_enum")._2)
    assert(!rep("min_o_totalprice")._2 && rep("min_o_totalprice")._1 == -2.0)
    clean.unpersist()
  }

  test("fd audit: g3 repair counts hand-checked; held FD reports zero violations") {
    import spark.implicits._
    // x=1 → {a,a,b}: 1 violating group, plurality a ⇒ 1 repair row.
    // x=2 → {c,c}: clean. x=3 → {d,e,f}: plurality 1 ⇒ 2 repair rows.
    val t = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "c"),
      (3, "d"), (3, "e"), (3, "f")).toDF("x", "y")
    val r = Audit.fdSummaryOf(t, "t: x -> y", "x", "y").collect()(0)
    assert(r.getLong(1) == 3L)   // lhs groups
    assert(r.getLong(2) == 2L)   // violating groups (x=1, x=3)
    assert(r.getLong(3) == 3L)   // minimal repairs (1 + 0 + 2)
    assert(!r.getBoolean(4))
    val held = Audit.fdSummaryOf(t.filter($"x" === 2), "t: x -> y", "x", "y").collect()(0)
    assert(held.getLong(2) == 0L && held.getBoolean(4))
    // the registered 5-FD suite: nation's key FD must hold, the
    // known-violated ones must not, and every count is internally sane
    val suite = Audit.fdViolations(spark, Sf).collect()
      .map(row => row.getString(0) -> row).toMap
    assert(suite("nation: n_nationkey -> n_regionkey").getBoolean(4))
    assert(!suite("lineitem: l_partkey -> l_suppkey").getBoolean(4))
    suite.values.foreach { row =>
      assert(row.getLong(2) <= row.getLong(1))          // viol groups ≤ groups
      assert((row.getLong(2) == 0L) == row.getBoolean(4))
      assert(row.getLong(3) >= row.getLong(2))          // ≥1 repair per viol group
    }
  }

  test("fd incremental: covers exactly the touched groups; counts reconcile with a full recompute") {
    import spark.implicits._
    val out = Audit.fdIncremental(spark, Sf).cache()
    val li = graft.Tables.lineitem(spark, Sf)
      .select($"l_orderkey".as("id"), $"l_partkey".as("x"), $"l_suppkey".as("y"))
    // report rows = exactly the batch's distinct LHS keys
    val touched = li.filter($"id" % 10 === 7).select($"x").distinct().count()
    assert(out.count() == touched)
    // every touched group gained at least one row; distinct-RHS never shrinks
    assert(out.filter($"rows_added" < 1).count() == 0)
    assert(out.filter($"dy_after" < $"dy_before").count() == 0)
    assert(out.filter($"newly_violating" =!= ($"dy_before" <= 1 && $"dy_after" > 1)).count() == 0)
    // after-counts agree with a from-scratch recompute over the full table
    val full = li.groupBy($"x", $"y").count()
      .groupBy($"x").agg(sum($"count").as("n_full"), count(lit(1)).as("dy_full"))
    val j = out.join(full, out("l_partkey") === full("x"))
    assert(j.filter($"n_after" =!= $"n_full" || $"dy_after" =!= $"dy_full").count() == 0)
    out.unpersist()
  }

  test("mutual information: decomposition + bounds hold (MI = Hx+Hy-Hxy, 0 <= NMI <= 1)") {
    import spark.implicits._
    val r = Drift.miLangSource(spark, Sf).head()
    val mi = r.getAs[Double]("mi"); val nmi = r.getAs[Double]("nmi")
    val hx = r.getAs[Double]("h_lang"); val hy = r.getAs[Double]("h_source")
    val hxy = r.getAs[Double]("h_joint")
    // identity MI = H(X) + H(Y) - H(X,Y); per-term decimal quantization
    // bounds the drift well inside 1e-4
    assert(math.abs(mi - (hx + hy - hxy)) < 1e-4, s"mi=$mi hx=$hx hy=$hy hxy=$hxy")
    assert(mi >= -1e-6 && mi <= math.min(hx, hy) + 1e-6)
    assert(hxy >= math.max(hx, hy) - 1e-6 && hxy <= hx + hy + 1e-6)
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6)
    assert(r.getAs[Long]("n_docs") ==
      graft.Tables.documents(spark, Sf).count())
  }

  test("wasserstein drift: matches an exact driver-side recompute; trio inequalities hold") {
    import spark.implicits._
    val r = Drift.wassersteinValueDrift(spark, Sf).head()
    val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
    val w1 = r.getAs[Double]("w1")
    // exact recompute on the driver from raw values (sf0.001 is small)
    val vals = graft.Tables.events(spark, Sf)
      .filter($"value".isNotNull && $"event_type".isin("view", "purchase"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val a = vals.filter(_._1 == "view").map(_._2).sorted
    val b = vals.filter(_._1 == "purchase").map(_._2).sorted
    assert(a.length == na && b.length == nb)
    val distinct = (a ++ b).distinct.sorted
    val exact = distinct.zip(distinct.drop(1)).map { case (v, nv) =>
      val cuma = a.count(_ <= v).toLong; val cumb = b.count(_ <= v).toLong
      math.abs(cuma * nb - cumb * na).toDouble * (nv - v)
    }.sum / (na.toDouble * nb)
    assert(math.abs(w1 - exact) < 1e-4, s"w1=$w1 exact=$exact")
    // trio inequality: W1 <= KS * support width (area under a band)
    val ks = Drift.ksValueDrift(spark, Sf).head().getAs[Double]("ks_stat")
    assert(w1 >= 0.0 && w1 <= ks * (distinct.last - distinct.head) + 1e-6)
  }

  test("fd conditional: per-condition g3 reconciles with the global FD census") {
    import spark.implicits._
    val out = Audit.fdConditional(spark, Sf).cache()
    val statuses = graft.Tables.orders(spark, Sf)
      .select($"o_orderstatus").distinct().count()
    assert(out.count() == statuses)
    assert(out.filter($"violating_rows" > $"n_rows" - $"lhs_groups").count() == 0)
    assert(out.filter($"holds" =!= ($"violating_groups" === 0L)).count() == 0)
    // partition identity: condition n_rows sum to the table size, and
    // one condition recomputed exactly on the driver
    assert(out.agg(sum($"n_rows")).head().getLong(0) ==
      graft.Tables.orders(spark, Sf).count())
    val cells = graft.Tables.orders(spark, Sf)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_custkey", $"o_orderpriority").count()
      .as[(Long, String, Long)].collect()
    val byX = cells.groupBy(_._1)
    val r = out.filter($"cond" === "F").head()
    assert(r.getAs[Long]("lhs_groups") == byX.size)
    assert(r.getAs[Long]("violating_groups") == byX.values.count(_.length > 1))
    assert(r.getAs[Long]("violating_rows") ==
      byX.values.map(g => g.map(_._3).sum - g.map(_._3).max).sum)
    out.unpersist()
  }

  test("join key skew: moments match a driver recompute; hhi/skew bounds hold") {
    import spark.implicits._
    val out = Audit.joinKeySkew(spark, Sf).cache()
    assert(out.count() == 4)
    // bounds: skew >= 1, cv >= 0, 1/n_keys <= hhi <= 1
    assert(out.filter($"skew_max_over_avg" < 1.0 - 1e-9).count() == 0)
    assert(out.filter($"cv" < -1e-9).count() == 0)
    assert(out.filter(
      $"hhi" < lit(1.0) / $"n_keys" - 1e-9 || $"hhi" > 1.0 + 1e-9).count() == 0)
    // exact driver recompute for one leg
    val cnts = graft.Tables.orders(spark, Sf).groupBy($"o_custkey").count()
      .as[(Long, Long)].collect().map(_._2)
    val n = cnts.sum.toDouble; val k = cnts.length.toDouble
    val r = out.filter($"key_name" === "orders.o_custkey").head()
    assert(r.getAs[Long]("n_keys") == cnts.length)
    assert(r.getAs[Long]("n_rows") == cnts.sum)
    assert(r.getAs[Long]("max_cnt") == cnts.max)
    assert(math.abs(r.getAs[Double]("skew_max_over_avg") - cnts.max / (n / k)) < 1e-5)
    assert(math.abs(r.getAs[Double]("hhi")
      - cnts.map(c => c.toDouble * c).sum / (n * n)) < 1e-6)
    out.unpersist()
  }

  test("source overlap: jaccard bounds hold; one pair recomputed exactly") {
    import spark.implicits._
    val out = Dedup.sourceOverlap(spark, Sf).cache()
    assert(out.filter($"s1" >= $"s2").count() == 0)
    assert(out.filter($"common" > least($"n1", $"n2")).count() == 0)
    assert(out.filter($"jaccard" < 0.0 || $"jaccard" > 1.0).count() == 0)
    def shingles(src: String): Set[String] = graft.Tables.documents(spark, Sf)
      .filter($"source" === src).select($"text").as[String].collect()
      .flatMap { t =>
        val w = t.split(" ", -1)
        if (w.length < 3) Seq.empty
        else w.sliding(3).map(_.mkString(" ")).toSeq
      }.toSet
    val a = shingles("src0"); val b = shingles("src1")
    val r = out.filter($"s1" === "src0" && $"s2" === "src1").head()
    assert(r.getAs[Long]("n1") == a.size && r.getAs[Long]("n2") == b.size)
    assert(r.getAs[Long]("common") == a.intersect(b).size)
    assert(math.abs(r.getAs[Double]("jaccard") -
      a.intersect(b).size.toDouble / a.union(b).size) < 1e-5)
    out.unpersist()
  }

  test("embedding separation: scatter decomposition matches exact driver recompute") {
    import spark.implicits._
    val r = EmbeddingAudit.embeddingSeparation(spark, Sf).head()
    val rows = graft.Tables.embeddings(spark, Sf)
      .select($"label", $"embedding").as[(Int, Seq[Float])].collect()
      .map { case (l, v) => (l.toLong, v.map(_.toDouble).toArray) }
    val n = rows.length; val dims = rows.head._2.length
    val mu = (0 until dims).map(j => rows.map(_._2(j)).sum / n)
    val byL = rows.groupBy(_._1)
    val between = byL.values.map { g =>
      val muL = (0 until dims).map(j => g.map(_._2(j)).sum / g.length)
      g.length * muL.zip(mu).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    val within = byL.values.map { g =>
      val muL = (0 until dims).map(j => g.map(_._2(j)).sum / g.length)
      g.map(v => v._2.zip(muL).map { case (a, b) => (a - b) * (a - b) }.sum).sum
    }.sum
    assert(r.getAs[Long]("n_labels") == byL.size && r.getAs[Long]("n_vectors") == n)
    assert(math.abs(r.getAs[Double]("between_ss") - between) < 1e-2,
      s"between=${r.getAs[Double]("between_ss")} exact=$between")
    assert(math.abs(r.getAs[Double]("within_ss") - within) < 1e-2)
    // exact decomposition: total = between + within
    assert(math.abs(r.getAs[Double]("total_ss") - (between + within)) < 1e-2)
    assert(math.abs(r.getAs[Double]("fisher_ratio") - between / within) < 1e-4)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= -1e-9 && eta <= 1.0 + 1e-9)
  }

  test("dependency entropy: 20 pairs, information identities and bounds hold") {
    import spark.implicits._
    val out = Audit.dependencyEntropy(spark, Sf).cache()
    assert(out.count() == 20)
    // identities on every row: mi = hx + hy - hxy (to quantization),
    // 0 <= mi <= min(hx, hy), u in [0, 1], h_xy >= max(h_x, h_y)
    assert(out.filter(abs($"mi" - ($"h_x" + $"h_y" - $"h_xy")) > 1e-4).count() == 0)
    assert(out.filter($"mi" < -1e-6 || $"mi" > least($"h_x", $"h_y") + 1e-6).count() == 0)
    assert(out.filter($"u_y_given_x" < -1e-6 || $"u_y_given_x" > 1.0 + 1e-6).count() == 0)
    assert(out.filter($"h_xy" < greatest($"h_x", $"h_y") - 1e-6).count() == 0)
    // symmetry of the pieces: X -> Y and Y -> X share hx/hy swapped, same hxy/mi
    val ab = out.filter($"fd" === "o_orderstatus -> o_orderpriority").head()
    val ba = out.filter($"fd" === "o_orderpriority -> o_orderstatus").head()
    assert(ab.getAs[Double]("h_x") == ba.getAs[Double]("h_y"))
    assert(ab.getAs[Double]("h_xy") == ba.getAs[Double]("h_xy"))
    assert(ab.getAs[Double]("mi") == ba.getAs[Double]("mi"))
    out.unpersist()
  }

  test("oov rate: matches exact driver recompute from raw tokens") {
    import spark.implicits._
    val r = TextOps.oovRate(spark, Sf).head()
    val docs = graft.Tables.documents(spark, Sf)
      .select($"source", $"text").as[(String, String)].collect()
    val refVocab = docs.filter(_._1 != "src19")
      .flatMap(_._2.split(" ", -1)).toSet
    val newToks = docs.filter(_._1 == "src19").flatMap(_._2.split(" ", -1))
    val newTypes = newToks.toSet
    val oovTypes = newTypes.diff(refVocab)
    val oovToks = newToks.count(!refVocab.contains(_))
    assert(r.getAs[Long]("ref_types") == refVocab.size)
    assert(r.getAs[Long]("new_types") == newTypes.size)
    assert(r.getAs[Long]("oov_types") == oovTypes.size)
    assert(r.getAs[Long]("new_tokens") == newToks.length)
    assert(r.getAs[Long]("oov_tokens") == oovToks)
    assert(math.abs(r.getAs[Double]("oov_token_rate")
      - oovToks.toDouble / newToks.length) < 1e-5)
  }

  test("fd discovery: 20 candidates, internal identities, one leg hand-recomputed") {
    import spark.implicits._
    val out = Audit.fdDiscovery(spark, Sf).cache()
    val n = graft.Tables.orders(spark, Sf).count()
    assert(out.count() == 20)
    assert(out.filter($"n_total" =!= n).count() == 0)
    assert(out.filter($"holds" =!= ($"violating_groups" === 0L)).count() == 0)
    assert(out.filter($"violating_rows" > $"n_total" - $"lhs_groups").count() == 0)
    // hand recompute the smallest leg: o_orderstatus -> o_orderpriority
    val cells = graft.Tables.orders(spark, Sf)
      .groupBy($"o_orderstatus", $"o_orderpriority").count()
      .as[(String, String, Long)].collect()
    val byX = cells.groupBy(_._1)
    val vRows = byX.values.map(g => g.map(_._3).sum - g.map(_._3).max).sum
    val vGroups = byX.values.count(_.length > 1)
    val r = out.filter($"fd" === "o_orderstatus -> o_orderpriority").head()
    assert(r.getAs[Long]("lhs_groups") == byX.size)
    assert(r.getAs[Long]("violating_groups") == vGroups)
    assert(r.getAs[Long]("violating_rows") == vRows)
    assert(math.abs(r.getAs[Double]("g3") - vRows.toDouble / n) < 1e-5)
    out.unpersist()
  }

  test("embedding health: matches exact driver recompute; Jensen bound holds") {
    import spark.implicits._
    val r = EmbeddingAudit.embeddingHealth(spark, Sf).head()
    val vecs = graft.Tables.embeddings(spark, Sf)
      .select($"embedding").as[Seq[Float]].collect().map(_.map(_.toDouble).toArray)
    val n = vecs.length; val dims = vecs.head.length
    assert(r.getAs[Long]("n_vectors") == n && r.getAs[Long]("n_dims") == dims)
    val meanSq = vecs.map(v => v.map(x => x * x).sum).sum / n
    val mu = (0 until dims).map(j => vecs.map(_(j)).sum / n)
    val muSq = mu.map(m => m * m).sum
    assert(math.abs(r.getAs[Double]("mean_sq_norm") - meanSq) < 1e-3)
    assert(math.abs(r.getAs[Double]("mu_sq_norm") - muSq) < 1e-4)
    assert(math.abs(r.getAs[Double]("isotropy") - muSq / meanSq) < 1e-4)
    // Jensen: ||mu||^2 <= E||v||^2, so isotropy in [0, 1]
    val iso = r.getAs[Double]("isotropy")
    assert(iso >= -1e-9 && iso <= 1.0 + 1e-9)
    val mn = r.getAs[Double]("min_sq_norm"); val mx = r.getAs[Double]("max_sq_norm")
    assert(mn <= meanSq + 1e-6 && meanSq <= mx + 1e-6)
  }

  test("fuzzy join: pairs share a block, respect the distance bound, no self/dup pairs") {
    import spark.implicits._
    val out = EntityRes.fuzzyJoinBlocked(spark, Sf).cache()
    assert(out.count() > 0)
    assert(out.filter($"dist" > 3 || $"dist" < 1).count() == 0)
    assert(out.filter($"name_a" >= $"name_b").count() == 0)
    // block key really is the last word of both names
    assert(out.filter(!$"name_a".endsWith($"block") || !$"name_b".endsWith($"block"))
      .count() == 0)
    // spot ground truth: 'old bolt' ↔ 'red bolt' differ by 2 edits
    val pair = out.filter($"name_a" === "old bolt" && $"name_b" === "red bolt")
    assert(pair.select($"dist").as[Int].head() == 2)
    out.unpersist()
  }

  test("scd2: changed keys close+reopen, unchanged carry, one current row per key") {
    import spark.implicits._
    val out = EntityRes.scd2Upsert(spark, Sf).cache()
    val perKey = out.groupBy($"custkey").agg(
      count(lit(1)).as("n"),
      sum(when($"is_current", 1).otherwise(0)).as("cur"))
    assert(perKey.filter($"cur" =!= 1).count() == 0)
    assert(perKey.filter($"custkey" % 7 === 0 && $"n" =!= 2).count() == 0)
    assert(perKey.filter($"custkey" % 7 =!= 0 && $"n" =!= 1).count() == 0)
    // closed rows: historic segment, bounded validity; opened: RESEGMENTED, open-ended
    val changed = out.filter($"custkey" % 7 === 0)
    assert(changed.filter($"is_current")
      .filter($"segment" =!= "RESEGMENTED" || $"valid_to".isNotNull).count() == 0)
    assert(changed.filter(!$"is_current")
      .filter($"segment" === "RESEGMENTED" || $"valid_to".isNull).count() == 0)
    out.unpersist()
  }

  test("merge upsert: deletes gone, updates rewritten, inserts landed, rest untouched") {
    import spark.implicits._
    val before = graft.Tables.orders(spark, Sf)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .as[(Long, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val after = EntityRes.mergeUpsert(spark, Sf)
      .as[(Long, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    before.foreach { case (k, (st, tp)) =>
      if (k % 13 == 5) assert(!after.contains(k), s"deleted key $k survived")
      else if (k % 7 == 0) {
        assert(after(k)._1 == "U")
        assert(math.abs(after(k)._2 - (tp + 10.0)) < 1e-6, s"update price wrong for $k")
      } else {
        assert(after(k)._1 == st, s"untouched key $k changed status")
        assert(math.abs(after(k)._2 - tp) < 1e-6, s"untouched key $k changed price")
      }
      // op precedence D > U > I: only pure %97 slice rows become inserts
      if (k % 97 == 3 && k % 13 != 5 && k % 7 != 0) {
        val ik = k + 10000000L
        assert(after.contains(ik) && after(ik)._1 == "I", s"insert for $k missing")
      }
    }
    // no unexplained keys: everything in `after` is a survivor or an insert
    val valid = before.keySet.filter(_ % 13 != 5) ++
      before.keySet.filter(k => k % 97 == 3 && k % 13 != 5 && k % 7 != 0).map(_ + 10000000L)
    assert(after.keySet === valid)
  }

  test("snapshot diff: changed = keys divisible by 7, nothing added/removed") {
    import spark.implicits._
    val out = EntityRes.snapshotDiff(spark, Sf)
      .as[(String, Long)].collect().toMap
    val keys = graft.Tables.customer(spark, Sf)
      .select($"c_custkey").as[Long].collect()
    assert(out.getOrElse("changed", 0L) == keys.count(_ % 7 == 0))
    assert(out.getOrElse("unchanged", 0L) == keys.count(_ % 7 != 0))
    assert(!out.contains("added") && !out.contains("removed"))
  }

  test("multi-touch attribution conserves the attributed purchase value") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, Sf)
    // ground truth: every purchase with >=1 click in the prior hour
    // contributes its FULL value exactly once, split across touches
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)].collect()
    val attributedTotal = purchases.filter { case (_, u, pts, _) =>
      clicks.exists { case (cu, cts) =>
        cu == u && cts.getTime >= pts.getTime - 3600000L && cts.getTime < pts.getTime }
    }.map(_._4).sum
    val got = Temporal.multitouchAttribution(spark, Sf)
      .agg(org.apache.spark.sql.functions.sum($"attributed")).as[Double].head()
    assert(math.abs(got - attributedTotal) < 1e-2, s"$got vs $attributedTotal")
  }

  test("incremental dedup: survivors are batch-first, corpus-unseen texts") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val corpusTexts = docs.filter(_._1 % 10 != 7).map(_._2).toSet
    val expected = docs.filter(_._1 % 10 == 7)
      .filterNot(d => corpusTexts.contains(d._2))
      .groupBy(_._2).map { case (_, vs) => vs.map(_._1).min }.toSet
    val got = Dedup.incrementalDedup(spark, Sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_ % 10 == 7))
  }

  test("classifier: logit equals the JVM-computed hash-weight sum") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta beta"), (2L, "gamma")).toDF("doc_id", "text")
    def w(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1000 - 500
    }
    val got = Classifier.qualityClassifierOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val exp1 = w("alpha") + 2 * w("beta")
    val exp2 = w("gamma")
    assert(got(1L) == ((3L, exp1, exp1 > 0)))
    assert(got(2L) == ((1L, exp2, exp2 > 0)))
  }
}

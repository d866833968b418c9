package graft.operators

import org.apache.spark.sql.functions.{greatest, least}

import graft.{SparkSuite, Tables}

/** First-principles checks for [[Graph.domainRank]]: an independent
  * Scala-collections PageRank over the same derived edge list must agree
  * bit-for-bit (the determinism contract), plus the structural laws a
  * fixed-point PageRank must satisfy. */
class GraphSpec extends SparkSuite {

  private def referencePr(docIds: Seq[Long]): Map[Long, Long] = {
    val edges = (for {
      d <- docIds
      (m, c) <- Graph.LinkDerivations
      src = d % Graph.NDomains
      dst = (d * m + c) % Graph.NDomains
      if src != dst
    } yield (src, dst)).toSet
    val nodes = edges.map(_._1) ++ edges.map(_._2)
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size
    val init = Graph.Scale / n
    val base = (15L * init) / 100L
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to Graph.Iters) {
      val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, t) =>
        contrib(t) = contrib.getOrElse(t, 0L) + r(s) / outdeg(s)
      }
      r = nodes.map(v => v -> (base + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("domainRank agrees bit-for-bit with an independent in-memory PageRank") {
    import spark.implicits._
    val docIds = Tables.documents(spark, Sf).select($"doc_id").as[Long].collect().toSeq
    val want = referencePr(docIds)
    val got = Graph.domainRank(spark, Sf).collect().map { row =>
      val domain = row.getString(0)
      val node = domain.stripPrefix("d").stripSuffix(".example.com").toLong
      node -> row.getLong(1)
    }.toMap
    assert(got.keySet === want.keySet)
    val diff = want.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diff.isEmpty, s"rank mismatches: ${diff.take(5)}")
  }

  test("domainRank satisfies fixed-point structural laws") {
    val rows = Graph.domainRank(spark, Sf).collect()
    // every derived domain present, ranks strictly positive
    assert(rows.length === Graph.NDomains)
    assert(rows.forall(_.getLong(1) > 0L))
    // mass conservation up to documented flooring loss: ≤ 1e-12 per edge
    // per iteration plus the damping floor — bounded well above by 1e-6
    val mass = rows.map(_.getLong(1)).sum
    assert(mass <= Graph.Scale)
    assert(mass >= Graph.Scale - 1000000L, s"lost too much mass: $mass")
    // output is sorted by (rank desc, domain)
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys === keys.sorted)
  }

  test("ppr: agrees bit-for-bit with an independent in-memory personalized PageRank") {
    import spark.implicits._
    val docIds = Tables.documents(spark, Sf).select($"doc_id").as[Long].collect().toSeq
    val edges = (for {
      d <- docIds
      (m, c) <- Graph.LinkDerivations
      src = d % Graph.NDomains
      dst = (d * m + c) % Graph.NDomains
      if src != dst
    } yield (src, dst)).toSet
    val nodes = edges.map(_._1) ++ edges.map(_._2)
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nSeeds = nodes.count(_ % 10 == 0).toLong
    val seedBase = (15L * Graph.Scale) / (100L * nSeeds)
    val init = Graph.Scale / nodes.size
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to Graph.Iters) {
      val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, t) =>
        contrib(t) = contrib.getOrElse(t, 0L) + r(s) / outdeg(s)
      }
      r = nodes.map(v => v ->
        ((if (v % 10 == 0) seedBase else 0L) +
          (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    val got = Graph.pprSeeded(spark, Sf).collect().map { row =>
      val node = row.getString(0).stripPrefix("d").stripSuffix(".example.com").toLong
      node -> row.getLong(2)
    }.toMap
    assert(got === r)
    // rank must actually concentrate near the seeds: seed mass share under
    // PPR strictly exceeds its share under uniform-teleport PageRank
    val pr = referencePr(docIds)
    def seedShare(m: Map[Long, Long]) =
      m.collect { case (k, v) if k % 10 == 0 => v }.sum.toDouble / m.values.sum
    assert(seedShare(got) > seedShare(pr), "PPR failed to personalize")
  }

  test("triangles: hand arithmetic on a planted K4 + pendant path") {
    import spark.implicits._
    // K4 on {0,1,2,3} (4 triangles; each vertex in C(3,2)=3 of them),
    // pendant 4–5 attached at 3 (no triangle through 4 or 5).
    // Directions are arbitrary — the operator canonicalizes.
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (3L, 1L), (2L, 3L),
      (3L, 4L), (5L, 4L)).toDF("src", "dst")
    val got = Graph.triangleCountsOf(edges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byNode = got.map { case (dom, deg, tri, cc) =>
      dom.stripPrefix("d").stripSuffix(".example.com").toLong -> ((deg, tri, cc))
    }.toMap
    assert(byNode(0L) === ((3L, 3L, 1.0)))
    assert(byNode(1L) === ((3L, 3L, 1.0)))
    assert(byNode(2L) === ((3L, 3L, 1.0)))
    assert(byNode(3L) === ((4L, 3L, 0.5))) // deg 4 → 3/C(4,2) = 0.5
    assert(byNode(4L) === ((2L, 0L, 0.0)))
    assert(byNode(5L) === ((1L, 0L, 0.0)))
    // total triangles: each counted at 3 nodes → sum/3 = 4
    assert(got.map(_._3).sum === 12L)
  }

  test("triangle orientation bounds hub fan-out: no wedge pivots at the hub") {
    import spark.implicits._
    // Star: hub 0 with 200 leaves, plus one triangle among leaves 1,2,3.
    // A naive shared-endpoint wedge join would enumerate C(200,2) = 19900
    // wedges at the hub; the degree orientation points every spoke INTO
    // the hub, so the hub pivots zero wedges and per-node fan-out stays
    // bounded by the number of higher-rank neighbors.
    val edges = ((1L to 200L).map(i => (0L, i)) ++
      Seq((1L, 2L), (2L, 3L), (1L, 3L))).toDF("src", "dst")
    val oriented = Graph.orientedEdges(edges)
    val outdeg = oriented.groupBy($"u").count().select($"count").as[Long].collect()
    assert(outdeg.max <= 3L, s"oriented out-degree exploded: ${outdeg.max}")
    // wedge relation size = Σ C(outdeg, 2): tiny vs the naive 19900
    val wedgePairs = outdeg.map(d => d * (d - 1) / 2).sum
    assert(wedgePairs <= 10L, s"wedge relation not skew-bounded: $wedgePairs")
    // counts: 4 triangles — {1,2,3} plus {0,i,j} for each edge among
    // the interconnected leaves; hub in 3, each of 1,2,3 in 3
    val got = Graph.triangleCountsOf(edges).collect()
      .map(r => r.getString(0).stripPrefix("d").stripSuffix(".example.com").toLong
        -> r.getLong(2)).toMap
    assert(got(0L) === 3L)
    assert(got(1L) === 3L && got(2L) === 3L && got(3L) === 3L)
    assert(got.values.sum === 12L)
  }

  test("triangles agree with an independent in-memory count on the corpus graph") {
    import spark.implicits._
    val docIds = Tables.documents(spark, Sf).select($"doc_id").as[Long].collect().toSeq
    val und: Set[(Long, Long)] = (for {
      d <- docIds
      (m, c) <- Graph.LinkDerivations
      src = d % Graph.NDomains
      dst = (d * m + c) % Graph.NDomains
      if src != dst
    } yield (math.min(src, dst), math.max(src, dst))).toSet
    val adj = (und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val got = Graph.triangleCounts(spark, Sf).collect()
      .map(r => r.getString(0).stripPrefix("d").stripSuffix(".example.com").toLong
        -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === adj.keySet)
    adj.foreach { case (v, ns) =>
      val pairsClosed = ns.toSeq.sorted.combinations(2).count {
        case Seq(x, y) => adj(x).contains(y)
        case _ => false
      }.toLong
      assert(got(v) === ((ns.size.toLong, pairsClosed)),
        s"node $v: got ${got(v)} want (${ns.size}, $pairsClosed)")
    }
  }

  test("incremental triangles: hand fixture covers 1-, 2- and 3-new-edge triangles") {
    import spark.implicits._
    // old graph: edge 1–2 plus an untouched triangle {7,8,9}
    // delta: {2,3},{1,3}  → closes triangle {1,2,3} (one old edge)
    //        {4,5},{5,6},{4,6} → all-new triangle {4,5,6}
    // max-edge attribution must count each exactly once
    val old = Seq((1L, 2L), (7L, 8L), (8L, 9L), (7L, 9L)).toDF("src", "dst")
    val delta = Seq((2L, 3L), (3L, 1L), (4L, 5L), (6L, 5L), (4L, 6L)).toDF("src", "dst")
    val undOld = old.select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b")).distinct()
    val base = Graph.triangleCountsOf(old)
    val got = Graph.refreshTriangles(base, undOld, delta).collect()
      .map(r => r.getString(0).stripPrefix("d").stripSuffix(".example.com").toLong
        -> ((r.getLong(1), r.getLong(2)))).toMap
    val full = Graph.triangleCountsOf(old.unionAll(delta)).collect()
      .map(r => r.getString(0).stripPrefix("d").stripSuffix(".example.com").toLong
        -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === full)
    // explicit hand values: {1,2,3} and {4,5,6} once each, {7,8,9} untouched
    assert(got(1L) === ((2L, 1L)) && got(3L) === ((2L, 1L)))
    assert(got(4L) === ((2L, 1L)) && got(5L) === ((2L, 1L)) && got(6L) === ((2L, 1L)))
    assert(got(7L) === ((2L, 1L)))
  }

  test("incremental triangles: refresh == full rebuild on the corpus graph, delta-duplicate-proof") {
    import spark.implicits._
    val full = Graph.triangleCounts(spark, Sf).collect().toSeq
    val inc = Graph.triangleCountsIncremental(spark, Sf).collect().toSeq
    assert(inc === full)
    // duplicate-delta robustness: re-applying edges that already exist
    // must be a no-op (anti-join guard)
    val undFull = Tables.documents(spark, Sf).select($"doc_id")
      .transform(Graph.domainEdgesOf)
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b")).distinct()
    val again = Graph.refreshTriangles(
      Graph.triangleCounts(spark, Sf),
      undFull,
      Tables.documents(spark, Sf).select($"doc_id").transform(Graph.domainEdgesOf))
      .collect().toSeq
    assert(again === full)
  }

  test("k-core: K5 survives the peel, the attached tail does not") {
    import spark.implicits._
    // K5 on {0..4} (every node degree 4 → the 4-core), tail 4–5–6.
    // Node 4 starts at degree 5; after the tail peels it must sit at
    // core degree 4 like the rest.
    val k5 = for { i <- 0L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val edges = (k5 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = Graph.kCoreOf(edges).collect()
      .map(r => r.getString(0).stripPrefix("d").stripSuffix(".example.com").toLong
        -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    (0L to 3L).foreach(v => assert(got(v) === ((4L, 4L, 1)), s"node $v"))
    assert(got(4L) === ((5L, 4L, 1)))
    assert(got(5L) === ((2L, 0L, 0)))
    assert(got(6L) === ((1L, 0L, 0)))
  }

  test("k-core peel is stable within the fixed rounds on the corpus graph") {
    import spark.implicits._
    val docIds = Tables.documents(spark, Sf).select($"doc_id").as[Long].collect().toSeq
    val und: Set[(Long, Long)] = (for {
      d <- docIds
      (m, c) <- Graph.LinkDerivations
      src = d % Graph.NDomains
      dst = (d * m + c) % Graph.NDomains
      if src != dst
    } yield (math.min(src, dst), math.max(src, dst))).toSet
    // independent in-memory peel run to FIXPOINT (no round cap)
    var alive = und
    var changed = true
    while (changed) {
      val deg = alive.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val keep = deg.collect { case (v, d) if d >= Graph.CoreK => v }.toSet
      val next = alive.filter { case (a, b) => keep(a) && keep(b) }
      changed = next != alive
      alive = next
    }
    val coreDeg = alive.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val got = Graph.kCore(spark, Sf).collect()
      .map(r => r.getString(0).stripPrefix("d").stripSuffix(".example.com").toLong
        -> ((r.getLong(2), r.getInt(3)))).toMap
    // the fixed CoreRounds peel must equal the true fixpoint — i.e. 10
    // rounds are enough on this graph, and the flag is the real k-core
    got.foreach { case (v, (cd, flag)) =>
      assert(cd === coreDeg.getOrElse(v, 0L), s"node $v core degree")
      assert(flag === (if (coreDeg.getOrElse(v, 0L) >= Graph.CoreK) 1 else 0))
    }
  }

  test("harmonic centrality matches hand arithmetic on a planted path+hub") {
    import spark.implicits._
    // graph: 0→1, 1→2, 0→2 (hub 2 also reached directly), 3→0
    // d(·,2): from 1 = 1, from 0 = 1 (direct), from 3 = 2
    //   → H(2) = 1 + 1 + 1/2 = 2.5
    // d(·,1): from 0 = 1, from 3 = 2 → H(1) = 1.5
    // d(·,0): from 3 = 1 → H(0) = 1.0
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 0L)).toDF("src", "dst")
    val got = Graph.harmonicOf(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val S = Graph.Scale
    assert(got("d2.example.com") === S + S + S / 2)
    assert(got("d1.example.com") === S + S / 2)
    assert(got("d0.example.com") === S)
  }

  test("harmonic centrality structural laws on the real corpus graph") {
    val rows = Graph.harmonicCentrality(spark, Sf).collect()
    assert(rows.length === Graph.NDomains)
    // each score is below (n-1)·Scale (all other nodes at distance 1)
    assert(rows.forall(_.getLong(1) < (Graph.NDomains - 1).toLong * Graph.Scale))
    assert(rows.forall(_.getLong(1) > 0L))
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys === keys.sorted)
  }

  test("PageRank certificate: residuals match an independent trajectory, early stop honest") {
    import graft.Tables
    import spark.implicits._
    // independent in-memory trajectory with per-iteration L1 residuals
    val docIds = Tables.documents(spark, Sf).select($"doc_id").as[Long].collect().toSeq
    val edges = (for {
      d <- docIds
      (m, c) <- Graph.LinkDerivations
      src = d % Graph.NDomains
      dst = (d * m + c) % Graph.NDomains
      if src != dst
    } yield (src, dst)).toSet
    val nodes = edges.map(_._1) ++ edges.map(_._2)
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val init = Graph.Scale / nodes.size
    val base = (15L * init) / 100L
    var r = nodes.map(_ -> init).toMap
    val wantDeltas = scala.collection.mutable.ArrayBuffer.empty[Long]
    var done = false
    for (_ <- 1 to Graph.Iters if !done) {
      val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, t) =>
        contrib(t) = contrib.getOrElse(t, 0L) + r(s) / outdeg(s)
      }
      val next = nodes.map(v => v -> (base + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
      val d = nodes.toSeq.map(v => math.abs(next(v) - r(v))).sum
      wantDeltas += d
      done = d <= Graph.CertThreshold
      r = next
    }
    val got = Graph.pagerankCertificate(spark, Sf).collect()
      .map(row => (row.getInt(0), row.getLong(1), row.getInt(3)))
    assert(got.map(_._2).toSeq === wantDeltas.toSeq, "residual trajectory diverged")
    // early-stop honesty: every row but the last unconverged; the last
    // row converged iff the threshold was reached inside the budget
    assert(got.dropRight(1).forall(_._3 == 0))
    assert((got.last._3 == 1) === (wantDeltas.last <= Graph.CertThreshold))
    assert(got.length <= Graph.Iters)
  }

  test("HyperBall matches hand arithmetic exactly on the planted path+hub") {
    import spark.implicits._
    // same graph as the exact test: coupon-regime sketches are exact, so
    // the delta readout must reproduce H(2)=2.5, H(1)=1.5, H(0)=1.0 in
    // micro units with no envelope at all
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 0L)).toDF("src", "dst")
    val got = Graph.hyperBallOf(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val U = Graph.HbUnit
    assert(got("d2.example.com") === U + U + U / 2)
    assert(got("d1.example.com") === U + U / 2)
    assert(got("d0.example.com") === U)
    assert(got("d3.example.com") === 0L)
  }

  test("HyperBall ≡ exact harmonic centrality on the real corpus graph") {
    val exact = Graph.harmonicCentrality(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hb = Graph.harmonicHyperBall(spark, Sf).collect()
    assert(hb.length === Graph.NDomains)
    // coupon regime (97 domains ≪ the lgK=12 promotion threshold): every
    // ball estimate is exact, so the only divergence from the exact path
    // is the unit rounding (1e6 div d vs 1e12 div d) — bounded by
    // Radius · |V| units ≈ 6e-4 in harmonic terms
    hb.foreach { r =>
      val micro = r.getLong(1).toDouble / 1e6
      val pico = exact(r.getString(0)).toDouble / 1e12
      assert(math.abs(micro - pico) < 1e-3,
        s"${r.getString(0)}: hyperball $micro vs exact $pico")
    }
    // headline contract: same top-10 ordering as the exact ranking
    val exactTop10 = exact.toSeq.sortBy { case (dom, h) => (-h, dom) }
      .take(10).map(_._1)
    assert(hb.take(10).map(_.getString(0)).toSeq === exactTop10)
  }

  test("neighborhood function matches hand arithmetic on the planted path+hub") {
    import spark.implicits._
    // in-ball sizes per t (self included): B(0)={0},{0,3}; B(1)={1},{0,1},{0,1,3};
    // B(2)={2},{0,1,2},{0,1,2,3}; B(3)={3} forever
    // N: t0=4, t1=2+2+3+1=8, t2=2+3+4+1=10, then flat; eff diam: 10·N≥9·10 → t=2
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 0L)).toDF("src", "dst")
    val rows = Graph.neighborhoodOf(edges).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.map(r => (r._1, r._2)).toSeq ===
      Seq((0, 4L), (1, 8L), (2, 10L), (3, 10L), (4, 10L), (5, 10L), (6, 10L)))
    assert(rows.collect { case (t, _, _, 1) => t }.toSeq === Seq(2))
    assert(rows.map(_._3).toSeq ===
      Seq(0.4, 0.8, 1.0, 1.0, 1.0, 1.0, 1.0))
  }

  test("HyperBall state is O(|V|·KB), not O(pairs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{length, max}
    // dense random digraph: 300 nodes × 12 out-edges — within radius 6
    // reachability saturates, so the EXACT pair relation is ~|V|² ≈ 90 000
    // rows; the HyperBall state must stay at exactly |V| rows with
    // few-KB sketches regardless
    val n = 300
    val edges = (for {
      v <- 0 until n
      k <- 1 to 12
    } yield (v.toLong, ((v * 31 + k * 17 + 7) % n).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val state = Graph.hyperBallState(edges)
    assert(state.count() === n.toLong)
    val maxSk = state.agg(max(length($"sk"))).head().getInt(0)
    assert(maxSk <= 4096, s"sketch grew past the KB contract: $maxSk bytes")
    // and the sketches really did absorb ~the whole graph (reachability
    // saturated): every ball estimate is within 5% of |V|
    val minEst = state.agg(org.apache.spark.sql.functions.min($"est"))
      .head().getLong(0)
    assert(minEst >= (n * 0.95).toLong, s"balls did not saturate: $minEst")
  }

  test("SCC: hand-built digraph — cycles collapse, the connecting edge does not") {
    import spark.implicits._
    // 1→2→3→1 (SCC {1,2,3}), 3→4 one-way, 4→5→4 (SCC {4,5}),
    // 6→7 chain (two singletons), 8 self-contained via 8→9, 9→8 (SCC {8,9})
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 4L),
      (6L, 7L),
      (8L, 9L), (9L, 8L)).toDF("src", "dst")
    val got = Graph.stronglyConnectedOf(edges)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val want = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L),
      (6L, 6L, 1L), (7L, 7L, 1L),
      (8L, 8L, 2L), (9L, 8L, 2L))
    assert(got == want, s"got $got")
  }

  test("SCC: distributed FW-BW path equals the driver Tarjan path exactly") {
    import spark.implicits._
    // the same equivalence contract as Dedup's CC driver/distributed split
    for (edges <- Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 4L),
        (6L, 7L), (8L, 9L), (9L, 8L)).toDF("src", "dst"),
      Graph.sccEdges(spark, Sf))) {
      val fast = Graph.sccTarjan(edges)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val dist = Graph.stronglyConnectedDistributed(edges)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(fast == dist, "driver and distributed SCC paths diverged")
    }
  }

  test("SCC: the quadratic-map corpus graph has the known mixed structure") {
    import spark.implicits._
    val rows = Graph.stronglyConnected(spark, Sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.length == 97)
    val bySize = rows.groupBy(_._3).view.mapValues(_.size).toMap
    // one 67-node giant, one 2-cycle, 28 singletons
    assert(bySize == Map(67L -> 67, 2L -> 2, 1L -> 28), s"got $bySize")
    // scc_id is the min member id within every component
    rows.groupBy(_._2).foreach { case (id, members) =>
      assert(members.map(_._1).min == id, s"scc $id min-id violated")
    }
  }
}

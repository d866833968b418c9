package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Link-graph operators over the corpus — the domain-ranking quality
  * signal large-scale pretraining pipelines attach to every document
  * (CommonCrawl publishes exactly this: a PageRank/harmonic-centrality
  * ranking of the hosts it crawls, used to bias corpus selection toward
  * reputable domains; cf. Page et al. 1999, "The PageRank Citation
  * Ranking").
  *
  * The corpus carries no real hyperlinks, so the link graph is DERIVED
  * deterministically from `doc_id` residues (same convention as
  * [[TextOps.urlBlocklistFilter]]'s derived domains) — both engines
  * compute the identical edge list from `documents` alone, which is what
  * makes the oracle fully independent.
  *
  * Determinism contract (why integer arithmetic): float PageRank is
  * shuffle-order-dependent (double summation does not associate). Here
  * every rank is a BIGINT in units of 1e-12 (`Scale`), every per-edge
  * contribution is an integer `div`, and every damping step is
  * `(85 * x) div 100` — long sums are exact and order-independent, so
  * ten iterations produce bit-identical ranks on any partitioning, any
  * engine. Flooring drops ≤1 unit (1e-12) of mass per edge per
  * iteration — the committed fixed-point variant, total mass stays
  * 0.9999999990 of 1.0. Dangling-node mass (nodes with no out-edges) is
  * dropped rather than redistributed, the common web-graph simplification.
  *
  * 100 TB posture: a real web graph has O(10^10) edges and O(10^8)
  * nodes. The iteration below is the standard Pregel shape — edges are
  * the big, static relation (shuffled ONCE on `src` by the self-evident
  * hash partitioning of the contribution join), ranks are the small,
  * evolving relation re-shuffled each round (`groupBy(dst)` is the one
  * unavoidable per-iteration exchange). Catalyst broadcasts the
  * node-level rank table while it is small; at web scale the same plan
  * degrades gracefully to a co-partitioned sort-merge join, and the
  * per-iteration `localCheckpoint` keeps the 10-round lineage from
  * compounding into one mega-plan (re-planned 10× otherwise).
  */
object Graph {

  /** Rank unit: 1e-12. BIGINT ranks sum to ~1e12 across all nodes —
    * overflow headroom of 6 orders of magnitude even at 1e8 nodes. */
  private[operators] val Scale = 1000000000000L
  private[operators] val Iters = 10
  private[operators] val NDomains = 97
  /** The unrolled min-plus BFS chain d2..dRadius every distance oracle
    * shares (3 verbatim copies before this): d_k holds min-distance ≤ k
    * pairs; iterating to [[Radius]] bounds the certified diameter. */
  private def minPlusCtes: String = (2 to Radius).map { k =>
    val prev = s"d${k - 1}"
    s""",
       |d$k AS (SELECT src, dst, min(d) AS d FROM (
       |          SELECT src, dst, d FROM $prev
       |          UNION ALL
       |          SELECT p.src, e.dst, p.d + 1 AS d
       |          FROM $prev p JOIN edges e ON p.dst = e.src
       |        ) GROUP BY src, dst)""".stripMargin
  }.mkString

  /** The derived-edge UNION ALL body every Graph oracle shares — ONE
    * definition so the engine/oracle twin pairs cannot desynchronize on
    * a LinkDerivations change (8 verbatim copies before this). */
  private lazy val EdgeUnionSql: String = LinkDerivations
    .map { case (m, c) =>
      s"SELECT doc_id % $NDomains AS src, (doc_id * $m + $c) % $NDomains AS dst FROM documents"
    }
    .mkString(" UNION ALL ")


  /** (multiplier, offset) pairs deriving the three out-links of each
    * document; distinct residue maps so a doc's links spread over the
    * domain space. */
  private[operators] val LinkDerivations = Seq((31, 7), (17, 3), (5, 11))

  /** Derived domain-level edge list: `doc_id % 97 -> (doc_id*m + c) % 97`
    * per derivation, self-loops dropped, DISTINCT. At production scale
    * this is the href-extraction + host-normalization pass — one shuffle
    * (the distinct) over the raw link table. */
  private[operators] def domainEdges(s: SparkSession, d: String): DataFrame =
    domainEdgesOf(Tables.documents(s, d))

  private[operators] def domainEdgesOf(docsIn: DataFrame): DataFrame = {
    val s = docsIn.sparkSession
    import s.implicits._
    val docs = docsIn.select($"doc_id")
    LinkDerivations
      .map { case (m, c) =>
        docs.select(
          ($"doc_id" % NDomains).cast("long").as("src"),
          (($"doc_id" * m + c) % NDomains).cast("long").as("dst"))
      }
      .reduce(_ unionAll _)
      .where($"src" =!= $"dst")
      .distinct()
  }

  /** Fixed-point PageRank over the derived domain graph: 10 damped
    * iterations (d = 0.85) in exact integer arithmetic — see the object
    * doc for the determinism contract. Output: one row per domain,
    * highest rank first. */
  def domainRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Out-degrees are attached to the edge relation ONCE, outside the
    // loop (checkpointed, so iterations neither replan nor re-run the
    // degree aggregate): the previous shape re-joined outdeg every
    // iteration — one extra join stage × Iters on a metadata-scale
    // relation whose cost is pure orchestration.
    val edges = domainEdges(s, d)
      .join(domainEdges(s, d).groupBy($"src").agg(count(lit(1)).as("odeg")), "src")
      .localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct().localCheckpoint()
    // Node count is a metadata-scale scalar (domain cardinality, not row
    // count) — the one driver value the iteration is seeded from.
    val n = nodes.count()
    val init = Scale / n
    val base = (15L * init) / 100L

    var ranks = nodes.withColumn("r", lit(init)).localCheckpoint()
    for (_ <- 1 to Iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst", expr("r div odeg").as("share"))
        .groupBy($"dst").agg(sum($"share").as("contrib"))
      val prev = ranks
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select($"node",
          (lit(base) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("r"))
        .localCheckpoint()
      SessionCaches.freeLocalCheckpoint(prev)
    }
    SessionCaches.freeLocalCheckpoint(edges)
    SessionCaches.freeLocalCheckpoint(nodes)
    ranks
      .select(
        concat(lit("d"), $"node", lit(".example.com")).as("domain"),
        $"r".as("rank_scaled"),
        ($"r" / lit(1e12)).as("rank"))
      .orderBy($"rank_scaled".desc, $"domain")
  }

  /** Fully independent oracle: DuckDB re-derives the edge list from
    * `documents` and unrolls the same ten integer-arithmetic iterations
    * as chained CTEs (`//` is DuckDB's integer division; operands are
    * non-negative, so it agrees with Spark's `div`). Bit-identical by
    * construction — prototyped and verified against an independent
    * Python implementation at sf0.001/0.01/0.1 before adoption. */
  val domainRankOracle: String = {
    val edgeUnion = EdgeUnionSql
    val head =
      s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |odeg AS (SELECT src AS node, count(*) AS odeg FROM edges GROUP BY src),
         |n AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, CAST($Scale // n.n AS BIGINT) AS r
         |       FROM nodes CROSS JOIN n)""".stripMargin
    val iters = (1 to Iters).map { i =>
      val prev = s"r${i - 1}"
      s""",
         |c$i AS (SELECT e.dst AS node, CAST(sum(p.r // o.odeg) AS BIGINT) AS contrib
         |        FROM edges e JOIN $prev p ON e.src = p.node
         |        JOIN odeg o ON e.src = o.node
         |        GROUP BY e.dst),
         |r$i AS (SELECT nodes.node,
         |               CAST((15 * ($Scale // n.n)) // 100
         |                    + (85 * COALESCE(c$i.contrib, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node CROSS JOIN n)""".stripMargin
    }.mkString
    val tail =
      s"""
         |SELECT 'd' || CAST(node AS VARCHAR) || '.example.com' AS domain,
         |       r AS rank_scaled,
         |       r / 1e12 AS rank
         |FROM r$Iters
         |ORDER BY rank_scaled DESC, domain""".stripMargin
    head + iters + tail
  }

  /** Convergence threshold for the PageRank certificate: total L1
    * movement ≤ 0.1% of total mass (Scale/1000) declares the fixed point
    * reached — further iterations move less rank than the flooring loss
    * budget. */
  private[operators] val CertThreshold = Scale / 1000L

  /** PageRank convergence CERTIFICATE (round-8 verdict #7): the committed
    * [[domainRank]] runs a fixed 10 iterations — this query emits the
    * per-iteration L1 residual Σ|r_i(v) − r_{i−1}(v)| (exact integer, so
    * bit-identical cross-engine) and STOPS EARLY at the first iteration
    * whose residual clears [[CertThreshold]] — the evidence that the
    * fixed budget is enough (or by how much it isn't) instead of a bare
    * assertion. Each residual is one 97-row join + agg over the two
    * checkpointed rank relations — 10 driver scalars total, the
    * metadata-scale collect pattern. */
  def pagerankCertificate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Same two structural cuts as [[domainRank]] (degree pre-join,
    // checkpoint reclamation), plus the residual is FUSED into the
    // iteration's checkpointed relation: `next` carries prev_r alongside
    // r, so the per-iteration L1 delta is one narrow agg over the
    // checkpoint instead of a separate next⋈prev join job.
    val edges = domainEdges(s, d)
      .join(domainEdges(s, d).groupBy($"src").agg(count(lit(1)).as("odeg")), "src")
      .localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val init = Scale / n
    val base = (15L * init) / 100L
    var ranks = nodes.withColumn("r", lit(init)).localCheckpoint()
    val deltas = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var converged = false
    var i = 0
    while (i < Iters && !converged) {
      i += 1
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst", expr("r div odeg").as("share"))
        .groupBy($"dst").agg(sum($"share").as("contrib"))
      val prev = ranks
      val next = prev.withColumnRenamed("r", "prev_r")
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select($"node", $"prev_r",
          (lit(base) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("r"))
        .localCheckpoint()
      val d1 = next.agg(sum(abs($"r" - $"prev_r")).as("d")).head().getLong(0)
      deltas += ((i, d1))
      converged = d1 <= CertThreshold
      ranks = next.select($"node", $"r")
      SessionCaches.freeLocalCheckpoint(prev)
    }
    SessionCaches.freeLocalCheckpoint(edges)
    SessionCaches.freeLocalCheckpoint(nodes)
    deltas.toSeq
      .toDF("iter", "l1_delta_scaled")
      .select($"iter", $"l1_delta_scaled",
        ($"l1_delta_scaled" / lit(1e12)).as("l1_delta"),
        ($"l1_delta_scaled" <= CertThreshold).cast("int").as("converged"))
      .orderBy($"iter")
  }

  /** Fully independent oracle: the same unrolled integer iterations as
    * [[domainRankOracle]], with per-iteration L1 residuals joined between
    * consecutive rank CTEs, cut at the first converged iteration exactly
    * like the engine's early stop. */
  val pagerankCertificateOracle: String = {
    val edgeUnion = EdgeUnionSql
    val head =
      s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |odeg AS (SELECT src AS node, count(*) AS odeg FROM edges GROUP BY src),
         |n AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, CAST($Scale // n.n AS BIGINT) AS r
         |       FROM nodes CROSS JOIN n)""".stripMargin
    val iters = (1 to Iters).map { i =>
      val prev = s"r${i - 1}"
      s""",
         |c$i AS (SELECT e.dst AS node, CAST(sum(p.r // o.odeg) AS BIGINT) AS contrib
         |        FROM edges e JOIN $prev p ON e.src = p.node
         |        JOIN odeg o ON e.src = o.node
         |        GROUP BY e.dst),
         |r$i AS (SELECT nodes.node,
         |               CAST((15 * ($Scale // n.n)) // 100
         |                    + (85 * COALESCE(c$i.contrib, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node CROSS JOIN n),
         |dl$i AS (SELECT $i AS iter, CAST(sum(abs(a.r - b.r)) AS BIGINT) AS d
         |         FROM r$i a JOIN r${i - 1} b ON a.node = b.node)""".stripMargin
    }.mkString
    val tail =
      s""",
         |deltas AS (${(1 to Iters).map(i => s"SELECT * FROM dl$i").mkString(" UNION ALL ")}),
         |lim AS (SELECT COALESCE(min(iter), $Iters) AS m FROM deltas
         |        WHERE d <= $CertThreshold)
         |SELECT iter, d AS l1_delta_scaled, d / 1e12 AS l1_delta,
         |       CAST(d <= $CertThreshold AS INT) AS converged
         |FROM deltas CROSS JOIN lim WHERE iter <= lim.m
         |ORDER BY iter""".stripMargin
    head + iters + tail
  }

  /** BFS radius for harmonic centrality: with ~3 out-links per node on a
    * 97-node domain graph, reachability saturates well inside 6 hops —
    * and a FIXED radius (rather than iterate-to-fixpoint) is what makes
    * the oracle an exact unrolled-CTE twin. Pairs beyond the radius
    * contribute 0, the standard bounded-radius approximation of the
    * published host rankings. */
  private[operators] val Radius = 6

  /** Harmonic centrality over the same derived domain graph — the OTHER
    * ranking CommonCrawl publishes for its hosts (Boldi & Vigna 2014,
    * "Axioms for Centrality": H(v) = Σ_{u≠v} 1/d(u,v), the centrality
    * that handles disconnected graphs gracefully). Here d(u,v) is the
    * directed hop distance computed by min-plus BFS up to [[Radius]], and
    * every 1/d is the exact integer `Scale div d` — Long sums, so ranks
    * are bit-identical on any partitioning, any engine (the
    * [[domainRank]] determinism contract).
    *
    * 100 TB posture: the iteration is |V|²-bounded distance-relation
    * min-plus — the Pregel frontier shape. On a real host graph (1e8
    * nodes) exact all-pairs is infeasible and the published numbers use
    * HyperBall (HLL-counter BFS); the engine's HLL family is exactly the
    * machinery that variant plugs into, per-iteration state O(|V|·KB).
    * Edges stay persisted across rounds; each round localCheckpoints so
    * six min-plus joins don't compound into one mega-plan. */
  def harmonicCentrality(s: SparkSession, d: String): DataFrame =
    harmonicOf(domainEdges(s, d))

  /** The centrality over any (src, dst) edge relation (spec entry point
    * for planted graphs). */
  private[operators] def harmonicOf(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val edges = edgesIn.persist()
    var dist = edges.select($"src", $"dst", lit(1L).as("d")).localCheckpoint()
    for (_ <- 2 to Radius) {
      dist = dist
        .join(edges.withColumnRenamed("src", "mid").withColumnRenamed("dst", "nxt"),
          dist("dst") === col("mid"))
        .select($"src", $"nxt".as("dst"), ($"d" + 1L).as("d"))
        .unionByName(dist)
        .groupBy($"src", $"dst").agg(min($"d").as("d"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    dist
      .where($"src" =!= $"dst")
      .groupBy($"dst")
      .agg(sum(expr(s"$Scale div d")).as("h_scaled"))
      .select(
        concat(lit("d"), $"dst", lit(".example.com")).as("domain"),
        $"h_scaled",
        ($"h_scaled" / lit(1e12)).as("harmonic"))
      .orderBy($"h_scaled".desc, $"domain")
  }

  /** Fully independent oracle: the same edge derivation and Radius-hop
    * min-plus unrolled as chained CTEs, 1/d as the identical integer
    * division. */
  val harmonicCentralityOracle: String = {
    val edgeUnion = EdgeUnionSql
    val head =
      s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
         |d1 AS (SELECT src, dst, 1 AS d FROM edges)""".stripMargin
    val iters = minPlusCtes
    val tail =
      s"""
         |SELECT 'd' || CAST(dst AS VARCHAR) || '.example.com' AS domain,
         |       CAST(sum($Scale // d) AS BIGINT) AS h_scaled,
         |       CAST(sum($Scale // d) AS BIGINT) / 1e12 AS harmonic
         |FROM d$Radius WHERE src <> dst
         |GROUP BY dst
         |ORDER BY h_scaled DESC, domain""".stripMargin
    head + iters + tail
  }

  /** HLL precision for HyperBall counters. lgK=12 keeps each counter a
    * few KB; at the 97-domain test scale the DataSketches sketch stays in
    * coupon (exact) mode, so estimates equal exact ball sizes — the
    * published ~1.6% RSE regime only begins at ~1e3+ distincts/ball. */
  private[operators] val HbLgK = 12

  /** Harmonic-sum unit for the HyperBall readout: 1e-6 (micro), NOT the
    * exact path's 1e-12 — the per-iteration increment is
    * `delta × (unit div t)` and delta is up to |V|, so micro units keep
    * the product inside Long up to |V| ≈ 9e12 nodes (1e-12 units would
    * overflow at |V| ≈ 9e6, i.e. exactly the scale HyperBall exists for). */
  private[operators] val HbUnit = 1000000L

  /** HyperBall harmonic centrality (Boldi & Vigna 2014, "In-Core
    * Computation of Geometric Centralities with HyperBall") — the
    * at-scale variant of [[harmonicCentrality]]: instead of materializing
    * the (src, dst) distance relation (which on a power-law host graph
    * explodes to ~|V|² inside radius 6), every node carries ONE mergeable
    * HLL counter of the set {u : d(u, v) ≤ t}. Per iteration the counter
    * unions with its in-neighbors' counters (edges REVERSED relative to
    * ball-growing, because H(v) sums over distances TO v), and the
    * harmonic sum accumulates from counter DELTAS:
    *
    *   H(v) = Σ_t (|B(v,t)| − |B(v,t−1)|) / t
    *
    * 100 TB posture: per-iteration state is exactly |V| rows × a few-KB
    * sketch — O(|V|·KB), never O(pairs). The iteration is the same
    * Pregel shape as [[domainRank]]: edges shuffled once, the bounded
    * counter relation re-grouped per round, `localCheckpoint` per round
    * to stop lineage compounding. All readout arithmetic is integer
    * (estimates are BIGINT; `delta × (HbUnit div t)` Long sums), and the
    * DataSketches union is register-max — merge-order-free — so the
    * output is bit-deterministic on any partitioning.
    *
    * GraphSpec proves the contract both ways: estimate ≡ exact twin on
    * the coupon-regime testdata graph, and state-size O(|V|) on a graph
    * whose exact pair relation is quadratically larger. */
  def harmonicHyperBall(s: SparkSession, d: String): DataFrame =
    hyperBallOf(domainEdges(s, d))

  /** The HyperBall iteration over any (src, dst) edge relation (spec
    * entry point for planted graphs). */
  private[operators] def hyperBallOf(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val state = hyperBallState(edgesIn)
    state
      .select(
        concat(lit("d"), $"node", lit(".example.com")).as("domain"),
        $"h_units",
        ($"h_units" / lit(1e6)).as("harmonic"))
      .orderBy($"h_units".desc, $"domain")
  }

  /** The final iteration state — one row per node with the live sketch
    * bytes (`sk`), ball estimate (`est`) and accumulated harmonic sum
    * (`h_units`). Exposed so GraphSpec can assert the O(|V|·KB) state
    * contract directly (row count ≡ |V|, sketch bytes bounded). */
  private[operators] def hyperBallState(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val edges = edgesIn.persist()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct()
    // t = 0: each ball is exactly {v} — one single-item sketch per node
    var state = nodes.groupBy($"node")
      .agg(hll_sketch_agg($"node", lit(HbLgK)).as("sk"))
      .withColumn("est", hll_sketch_estimate($"sk"))
      .withColumn("h_units", lit(0L))
      .localCheckpoint()
    for (t <- 1 to Radius) {
      // counters flow ALONG edges (src's ball of ancestors reaches dst):
      // c_t(v) = c_{t-1}(v) ∪ ⋃_{(u,v)∈E} c_{t-1}(u)
      val incoming = edges
        .join(state.select($"node".as("src"), $"sk"), "src")
        .select($"dst".as("node"), $"sk")
      val grown = state.select($"node", $"sk").unionByName(incoming)
        .groupBy($"node").agg(hll_union_agg($"sk").as("sk"))
      state = state.select($"node", $"est".as("est_prev"), $"h_units")
        .join(grown, "node")
        .withColumn("est", hll_sketch_estimate($"sk"))
        .select($"node", $"sk", $"est",
          ($"h_units" +
            greatest($"est" - $"est_prev", lit(0L)) * lit(HbUnit / t))
            .as("h_units"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    state
  }

  /** Neighborhood function + effective diameter — the OTHER readout the
    * HyperBall counters pay for (HyperANF: Boldi, Rosa & Vigna 2011):
    * N(t) = Σ_v |B(v,t)| (reachable pairs within t hops, self included),
    * one row per t ∈ [0, Radius], plus the standard effective-diameter
    * flag on the smallest t with N(t) ≥ 0.9·N(Radius) (integer-exact
    * compare: 10·N(t) ≥ 9·N_max). Same O(|V|·KB) iteration state as
    * [[harmonicHyperBall]]; the per-round readout is ONE sum over the
    * |V|-row counter relation — Radius+1 driver scalars total. */
  def effectiveDiameter(s: SparkSession, d: String): DataFrame =
    neighborhoodOf(domainEdges(s, d))

  private[operators] def neighborhoodOf(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val edges = edgesIn.persist()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct()
    var state = nodes.groupBy($"node")
      .agg(hll_sketch_agg($"node", lit(HbLgK)).as("sk"))
      .withColumn("est", hll_sketch_estimate($"sk"))
      .localCheckpoint()
    def total(): Long = state.agg(sum($"est")).head().getLong(0)
    val totals = scala.collection.mutable.ArrayBuffer((0, total()))
    for (t <- 1 to Radius) {
      val incoming = edges
        .join(state.select($"node".as("src"), $"sk"), "src")
        .select($"dst".as("node"), $"sk")
      state = state.select($"node", $"sk").unionByName(incoming)
        .groupBy($"node").agg(hll_union_agg($"sk").as("sk"))
        .withColumn("est", hll_sketch_estimate($"sk"))
        .localCheckpoint()
      totals += ((t, total()))
    }
    edges.unpersist(blocking = false)
    val nMax = totals.last._2
    val effT = totals.find { case (_, n) => 10L * n >= 9L * nMax }.get._1
    totals.toSeq.toDF("t", "pairs_est")
      .select($"t", $"pairs_est",
        // decimal-quantize before the 4-dp round (the gapfill idiom:
        // raw-double rounds are engine-dependent at half-boundaries)
        round(($"pairs_est".cast("double") / lit(nMax.toDouble))
          .cast("decimal(28,8)"), 4).cast("double").as("frac"),
        ($"t" === effT).cast("int").as("is_effective_diameter"))
      .orderBy($"t")
  }

  /** Invariant twin: DuckDB recomputes the EXACT pair counts per radius
    * from the unrolled distance CTEs and collapses estimates beyond the
    * HLL envelope; `frac` and the effective-diameter flag are re-derived
    * from the golden's own pinned estimates (they are arithmetic over the
    * column being checked, so a wrong flag fails even when every estimate
    * passes its envelope). */
  val effectiveDiameterOracle: String = {
    val edgeUnion = EdgeUnionSql
    val head =
      s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
         |nv AS (SELECT count(*) AS n FROM (SELECT DISTINCT src AS v FROM edges
         |        UNION SELECT DISTINCT dst FROM edges)),
         |d1 AS (SELECT src, dst, 1 AS d FROM edges)""".stripMargin
    val iters = minPlusCtes
    val exacts = (0 to Radius).map { t =>
      if (t == 0) s"SELECT 0 AS t, n AS exact_pairs FROM nv"
      else
        s"""SELECT $t AS t, (SELECT n FROM nv) +
           |  (SELECT count(*) FROM d$Radius WHERE src <> dst AND d <= $t) AS exact_pairs"""
          .stripMargin
    }.mkString("(", " UNION ALL ", ")")
    val tail =
      s""",
         |ex AS (SELECT * FROM $exacts),
         |g AS (${Golden.dispatch("graph_effective_diameter")}),
         |gm AS (SELECT max(pairs_est) AS pmax,
         |              min(CASE WHEN 10 * pairs_est >= 9 * (SELECT max(pairs_est) FROM g)
         |                       THEN t END) AS eff_t
         |       FROM g)
         |SELECT g.t,
         |  CASE WHEN abs(g.pairs_est - ex.exact_pairs) <= 0.04 * ex.exact_pairs
         |       THEN g.pairs_est ELSE -1 END AS pairs_est,
         |  CASE WHEN g.frac = CAST(round(CAST(CAST(g.pairs_est AS DOUBLE) / gm.pmax AS DECIMAL(28,8)), 4) AS DOUBLE)
         |       THEN g.frac ELSE -1 END AS frac,
         |  CASE WHEN g.is_effective_diameter = CAST(g.t = gm.eff_t AS INT)
         |       THEN g.is_effective_diameter ELSE -1 END AS is_effective_diameter
         |FROM g JOIN ex ON ex.t = g.t CROSS JOIN gm
         |ORDER BY g.t""".stripMargin
    head + iters + tail
  }

  /** Invariant-twin oracle (the CMS/HLL pattern): the golden pins the
    * deterministic HyperBall readout; DuckDB independently recomputes the
    * EXACT harmonic centrality (the same unrolled min-plus CTEs as
    * [[harmonicCentralityOracle]]) and collapses any estimate beyond the
    * HLL envelope (4% ≈ 2.5σ at lgK=12) to −1, and any top-10 row whose
    * position diverges from the exact ranking to 'ORDER_MISMATCH' — so
    * both the values and the headline ordering are checked against
    * ground truth, not against the engine's own frozen output. */
  val harmonicHyperBallOracle: String = {
    val edgeUnion = EdgeUnionSql
    val head =
      s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
         |d1 AS (SELECT src, dst, 1 AS d FROM edges)""".stripMargin
    val iters = minPlusCtes
    val tail =
      s""",
         |ex AS (SELECT 'd' || CAST(dst AS VARCHAR) || '.example.com' AS domain,
         |              CAST(sum($HbUnit // d) AS BIGINT) AS h_exact,
         |              row_number() OVER (ORDER BY CAST(sum($HbUnit // d) AS BIGINT) DESC,
         |                                 'd' || CAST(dst AS VARCHAR) || '.example.com') AS re
         |       FROM d$Radius WHERE src <> dst
         |       GROUP BY dst),
         |g AS (${Golden.dispatch("graph_harmonic_hll")})
         |-- LEFT join + zero-coalesce: a node with NO in-edges never
         |-- enters ex (it groups by dst) but the engine rightly emits its
         |-- h_units=0 state row — an inner join would silently shrink the
         |-- oracle side and fail on row count (unreachable on the current
         |-- bijective derivations, load-bearing the day they change)
         |SELECT CASE WHEN g.__row < 10 AND coalesce(ex.re, 0) <> g.__row + 1
         |            THEN 'ORDER_MISMATCH' ELSE g.domain END AS domain,
         |       CASE WHEN abs(g.h_units - coalesce(ex.h_exact, 0))
         |                 <= 0.04 * coalesce(ex.h_exact, 0)
         |            THEN g.h_units ELSE -1 END AS h_units,
         |       CASE WHEN abs(g.harmonic - coalesce(ex.h_exact, 0) / 1e6)
         |                 <= 0.04 * (coalesce(ex.h_exact, 0) / 1e6)
         |            THEN g.harmonic ELSE -1 END AS harmonic
         |FROM g LEFT JOIN ex ON ex.domain = g.domain
         |ORDER BY g.__row""".stripMargin
    head + iters + tail
  }

  /** Triangle counting + local clustering coefficient over the
    * UNDIRECTED domain graph — the third classic whole-graph statistic
    * after PageRank and centrality (web-graph and social-graph audits
    * report it as the community-structure readout; cf. Schank & Wagner
    * 2005, "Finding, Counting and Listing All Triangles in Large
    * Graphs"; Suri & Vassilvitskii 2011 for the MapReduce shape).
    *
    * Algorithm: degree-ordered node-iterator. Every undirected edge is
    * oriented from its lower-(degree, id) endpoint to the higher one;
    * wedges are enumerated only at the LOW end of each edge pair and
    * closed against the oriented edge set. Each triangle {a,b,c} is
    * found exactly once (at its minimum-rank vertex), and per-node
    * counts come from exploding the found triangles back to their three
    * members.
    *
    * 100 TB posture: this orientation is the entire scale story — a
    * naive wedge join on shared endpoints puts Σ deg(v)² rows through
    * the shuffle (a single 10^7-degree hub ⇒ 10^14 wedges); orienting
    * by degree bounds the per-vertex fan-out by the number of HIGHER-
    * degree neighbors, giving O(m^{3/2}) total wedge work regardless of
    * skew — the hub's wedges are charged to its (few) higher-rank
    * neighbors, never to the hub itself. Both joins are plain hash
    * joins on bounded-width keys; nothing is ever materialized per
    * pair of non-adjacent nodes. */
  def triangleCounts(s: SparkSession, d: String): DataFrame =
    triangleCountsOf(domainEdges(s, d))

  /** Canonical undirected edges of `edgesIn`, oriented low→high by the
    * (degree, id) total order; `rv` carries the head's rank key. Split out
    * so GraphSpec can pin the orientation's skew bound (max oriented
    * out-degree stays small on a hub graph) independently of the counts. */
  private def orientFrom(und: DataFrame, deg: DataFrame): DataFrame = {
    val s = und.sparkSession
    import s.implicits._
    und
      .join(deg.select($"node".as("a"), $"degree".as("da")), "a")
      .join(deg.select($"node".as("b"), $"degree".as("db")), "b")
      .select(
        when(struct($"da", $"a") < struct($"db", $"b"),
          struct($"a".as("u"), $"b".as("v"), struct($"db".as("d"), $"b".as("n")).as("rv")))
          .otherwise(
            struct($"b".as("u"), $"a".as("v"), struct($"da".as("d"), $"a".as("n")).as("rv")))
          .as("e"))
      .select($"e.u".as("u"), $"e.v".as("v"), $"e.rv".as("rv"))
  }

  private[operators] def orientedEdges(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val und = edgesIn
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct()
    val deg = und.select($"a".as("node")).unionAll(und.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("degree"))
    orientFrom(und, deg)
  }

  private[operators] def triangleCountsOf(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    // Canonical undirected edge list: (a < b), direction collapsed.
    val und = edgesIn
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct().persist()
    triangleCountsOfUnd(und)
  }

  /** The counting core over an ALREADY-canonical (a, b) relation —
    * callers holding the canonical set materialized (the incremental
    * refresh shares it with three other references) pass it straight in
    * instead of paying the derive+distinct again. */
  private[operators] def triangleCountsOfUnd(und: DataFrame): DataFrame = {
    val s = und.sparkSession
    import s.implicits._
    // localCheckpoint is EAGER: deg and oriented are materialized here,
    // once — the self-join below would otherwise recompute the whole
    // orientation chain per reference (persist alone doesn't help: the
    // cache would be dropped again before the first action runs).
    val deg = und.select($"a".as("node")).unionAll(und.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("degree")).localCheckpoint()
    val oriented = orientFrom(und, deg).localCheckpoint()
    // Wedges at the low-rank pivot u: (u→x, u→y) with rank(x) < rank(y);
    // the closing edge, if present, is oriented x→y by transitivity.
    val wedges = oriented.select($"u", $"v".as("x"), $"rv".as("rx"))
      .join(oriented.select($"u", $"v".as("y"), $"rv".as("ry")), "u")
      .where($"rx" < $"ry")
    // One pass over the triangle relation: explode each found triangle to
    // its three members (a 3-leg unionAll would re-run the join chain per
    // leg — measured 3× the whole pipeline cost at 2M edges).
    val perNode = wedges
      .join(oriented.select($"u".as("x"), $"v".as("y")), Seq("x", "y"))
      .select(explode(array($"u", $"x", $"y")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select(
        concat(lit("d"), $"node", lit(".example.com")).as("domain"),
        $"degree".cast("long").as("degree"),
        coalesce($"triangles", lit(0L)).cast("long").as("triangles"),
        round(
          when($"degree" >= 2,
            lit(2.0) * coalesce($"triangles", lit(0L)) / ($"degree" * ($"degree" - 1)))
            .otherwise(lit(0.0)),
          4).as("clustering"))
      .orderBy($"triangles".desc, $"domain")
    und.unpersist(blocking = false)
    out
  }

  /** Fully independent oracle: DuckDB re-derives the canonical edge list
    * and counts triangles by the textbook ordered 3-way self-join
    * (a < b < c on canonical edges — the same "each triangle once"
    * invariant as the engine's degree orientation, so the counts agree
    * exactly). The quotient's operands are identical integers on both
    * sides, so the 4-dp round of the IEEE double agrees bit-for-bit. */
  val triangleCountsOracle: String = {
    val edgeUnion = EdgeUnionSql
    s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
       |deg AS (SELECT node, count(*) AS degree FROM
       |          (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
       |        GROUP BY node),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM und e1
       |        JOIN und e2 ON e2.a = e1.b
       |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       |pn AS (SELECT node, count(*) AS t FROM
       |         (SELECT x AS node FROM tri UNION ALL
       |          SELECT y FROM tri UNION ALL
       |          SELECT z FROM tri)
       |       GROUP BY node)
       |SELECT 'd' || CAST(deg.node AS VARCHAR) || '.example.com' AS domain,
       |       CAST(deg.degree AS BIGINT) AS degree,
       |       CAST(COALESCE(pn.t, 0) AS BIGINT) AS triangles,
       |       CAST(round(CASE WHEN deg.degree >= 2
       |                       THEN 2.0 * COALESCE(pn.t, 0)
       |                            / (deg.degree * (deg.degree - 1))
       |                       ELSE 0.0 END, 4) AS DOUBLE) AS clustering
       |FROM deg LEFT JOIN pn ON pn.node = deg.node
       |ORDER BY triangles DESC, domain""".stripMargin
  }

  /** Incremental triangle maintenance — the ∝-delta refresh family
    * (IVF/LSH/postings/PCA/cluster labels, round 8-9) extended to GRAPH
    * STATISTICS: a corpus append adds link-graph edges, and the per-node
    * triangle counts update from the BASE artifact plus work proportional
    * to the delta, never a full recount.
    *
    * Math: every triangle gained by the append contains ≥ 1 new edge.
    * Order edges by (isNew, a, b); each new triangle is counted exactly
    * once, at its MAXIMAL edge — which is always a new edge — by
    * enumerating, per new edge (a,b), the common neighbors c of a and b
    * in the UNION graph, and discarding the candidate when either
    * closing edge is a new edge that orders above (a,b). Degrees update
    * additively from the new-edge incidence.
    *
    * Refresh ≡ rebuild exactly (no approximation), so the registered
    * query is gated against the FULL-REBUILD oracle
    * ([[triangleCountsOracle]]) — the same hard-gate shape as
    * `dedup_cluster_incremental` vs `dedup_cluster_docs`.
    *
    * 100 TB posture: the two candidate joins are keyed on the DELTA
    * edge's endpoints — the old graph is probed (join output
    * ∝ |delta| · avg-degree), never rescanned; the base counts relation
    * is touched once by an outer join on node. A 0.1% edge append costs
    * 0.1% of the rebuild's wedge work. */
  def triangleCountsIncremental(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    // the base corpus misses every doc whose residue sources nodes 0..19,
    // so the "append" contributes genuinely new edges, not duplicates
    val base = docs.where($"doc_id" % NDomains >= 20)
    val delta = docs.where($"doc_id" % NDomains < 20)
    // ONE derive+distinct of the base edge set, eagerly materialized —
    // it feeds the base counts AND the refresh's three references
    val undOld = domainEdgesOf(base)
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct().localCheckpoint()
    val baseCounts = triangleCountsOfUnd(undOld)
    refreshTriangles(baseCounts, undOld, domainEdgesOf(delta))
  }

  /** Apply a delta edge batch to a frozen per-node triangle artifact.
    * `baseCounts` is [[triangleCountsOf]]'s output on `undOld`;
    * `deltaEdgesRaw` is any directed/duplicated edge batch (canonicalized
    * and de-duplicated against the old set here). */
  private[operators] def refreshTriangles(
      baseCounts: DataFrame, undOld: DataFrame, deltaEdgesRaw: DataFrame): DataFrame = {
    val s = undOld.sparkSession
    import s.implicits._
    val newE = deltaEdgesRaw
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .where($"a" =!= $"b").distinct()
      .join(undOld, Seq("a", "b"), "left_anti")
      .localCheckpoint() // eager: reused by both candidate joins + degrees
    // union adjacency, both directions, carrying canonical id + newness
    val allE = undOld.withColumn("nw", lit(false))
      .unionByName(newE.withColumn("nw", lit(true)))
    val adj = allE.select($"a".as("x"), $"b".as("y"), $"nw", $"a".as("ca"), $"b".as("cb"))
      .unionAll(allE.select($"b".as("x"), $"a".as("y"), $"nw", $"a".as("ca"), $"b".as("cb")))
    // candidates: common neighbors c of the new edge's endpoints
    val leg1 = newE
      .join(adj.select($"x".as("a"), $"y".as("c"),
        $"nw".as("nw1"), $"ca".as("ca1"), $"cb".as("cb1")), Seq("a"))
      .where($"c" =!= $"b")
    val tris = leg1
      .join(adj.select($"x".as("b"), $"y".as("c"),
        $"nw".as("nw2"), $"ca".as("ca2"), $"cb".as("cb2")), Seq("b", "c"))
      // count the triangle at its maximal (isNew, a, b) edge: (a,b) IS
      // new, so discard when a closing NEW edge orders above it
      .where(!($"nw1" && struct($"ca1", $"cb1") > struct($"a", $"b")))
      .where(!($"nw2" && struct($"ca2", $"cb2") > struct($"a", $"b")))
      .select(explode(array($"a", $"b", $"c")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("d_tri"))
    val dDeg = newE.select(explode(array($"a", $"b")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("d_deg"))
    val baseByNode = baseCounts.select(
      expr(s"CAST(substring(domain, 2, length(domain) - ${".example.com".length + 1}) AS LONG)")
        .as("node"),
      $"degree".as("b_deg"), $"triangles".as("b_tri"))
    baseByNode
      .join(dDeg, Seq("node"), "full_outer")
      .join(tris, Seq("node"), "left")
      .select(
        concat(lit("d"), $"node", lit(".example.com")).as("domain"),
        (coalesce($"b_deg", lit(0L)) + coalesce($"d_deg", lit(0L))).as("degree"),
        (coalesce($"b_tri", lit(0L)) + coalesce($"d_tri", lit(0L))).as("triangles"))
      .select($"domain", $"degree", $"triangles",
        round(
          when($"degree" >= 2,
            lit(2.0) * $"triangles" / ($"degree" * ($"degree" - 1)))
            .otherwise(lit(0.0)),
          4).as("clustering"))
      .orderBy($"triangles".desc, $"domain")
  }

  /** Fixed-round k-core peel count: enough for this 97-node domain
    * graph (GraphSpec asserts the peel is stable well before the last
    * round); a FIXED count rather than iterate-to-fixpoint is what makes
    * the oracle an exact unrolled-CTE twin, the same trade as
    * [[Radius]]. */
  private[operators] val CoreK = 4
  private[operators] val CoreRounds = 10

  /** k-core decomposition (k = 4) of the undirected domain graph — the
    * density readout after counts ([[triangleCounts]]) and rankings
    * ([[domainRank]]): the k-core is the maximal subgraph where every
    * node keeps ≥ k neighbors, the standard "dense nucleus vs sparse
    * fringe" split (Seidman 1983; Batagelj & Zaveršnik 2003 for the
    * peel). Link-farm detection and crawl prioritization both read it:
    * a domain outside the core has no densely-linked neighborhood.
    *
    * Algorithm: synchronous peeling — drop every node with current
    * degree < k and all its edges, repeat for [[CoreRounds]] rounds.
    * Each round is one degree aggregation + one semi-join filter on the
    * surviving edge relation; `localCheckpoint` per round cuts the
    * compounding lineage exactly like the PageRank loop.
    *
    * 100 TB posture: the classic sequential peel (remove ONE minimum-
    * degree node at a time) is inherently serial; the synchronous
    * variant removes all sub-k nodes per round and converges in
    * O(peel depth) rounds — the distributed formulation (Montresor et
    * al. 2013). State per round is the surviving edge relation itself —
    * no per-pair materialization, nothing beyond the graph's own size,
    * shuffles keyed on node id throughout. */
  def kCore(s: SparkSession, d: String): DataFrame =
    kCoreOf(domainEdges(s, d))

  private[operators] def kCoreOf(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val und = edgesIn
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct().persist()
    def degrees(e: DataFrame): DataFrame =
      e.select($"a".as("node")).unionAll(e.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
    // eager: materialized before the peel loop unpersists anything
    val deg0 = degrees(und).localCheckpoint()
    var alive = und
    // Early stop at the fixpoint: the surviving edge set shrinks
    // monotonically, so an unchanged count IS an unchanged set, and the
    // remaining unrolled rounds are idempotent — the result is identical
    // to running all CoreRounds (which is what the oracle unrolls); the
    // engine just skips the no-op rounds. localCheckpoint is eager, so
    // the count reads the just-materialized round for free.
    var prevCount = -1L
    var round = 0
    while (round < CoreRounds && prevCount != 0L) {
      round += 1
      val keep = degrees(alive).filter($"deg" >= CoreK).select($"node")
      val next = alive
        .join(keep.select($"node".as("a")), "a")
        .join(keep.select($"node".as("b")), "b")
        .select($"a", $"b")
        .localCheckpoint()
      val c = next.count()
      if (c == prevCount) round = CoreRounds // fixpoint: skip no-op rounds
      prevCount = c
      alive = next
    }
    val coreDeg = degrees(alive)
    val out = deg0.as("d0")
      .join(coreDeg.as("dc").withColumnRenamed("deg", "core_deg"), Seq("node"), "left")
      .select(
        concat(lit("d"), $"node", lit(".example.com")).as("domain"),
        $"deg".cast("long").as("degree"),
        coalesce($"core_deg", lit(0L)).cast("long").as("core_degree"),
        (coalesce($"core_deg", lit(0L)) >= CoreK).cast("int").as("in_kcore"))
      .orderBy($"in_kcore".desc, $"core_degree".desc, $"domain")
    und.unpersist(blocking = false)
    out
  }

  /** Fully independent oracle: DuckDB re-derives the canonical edges and
    * unrolls the same ten synchronous peel rounds as chained CTEs —
    * bit-identical by construction, converged or not, because both
    * engines run the identical round count. */
  val kCoreOracle: String = {
    val edgeUnion = EdgeUnionSql
    val head =
      s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
         |deg0 AS (SELECT node, count(*) AS deg FROM
         |           (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
         |         GROUP BY node)""".stripMargin
    // AS MATERIALIZED: each round references its predecessor three times
    // (two degree legs + the edge filter); inlined CTEs would re-expand
    // the whole chain exponentially (~5^10 scans of `documents`).
    val rounds = (1 to CoreRounds).map { i =>
      val prev = s"e${i - 1}"
      s""",
         |k$i AS MATERIALIZED (SELECT node FROM
         |          (SELECT node, count(*) AS deg FROM
         |             (SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
         |           GROUP BY node)
         |        WHERE deg >= $CoreK),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
         |        JOIN k$i ka ON ka.node = e.a
         |        JOIN k$i kb ON kb.node = e.b)""".stripMargin
    }.mkString
    val tail =
      s""",
         |degf AS (SELECT node, count(*) AS deg FROM
         |           (SELECT a AS node FROM e$CoreRounds UNION ALL
         |            SELECT b FROM e$CoreRounds)
         |         GROUP BY node)
         |SELECT 'd' || CAST(deg0.node AS VARCHAR) || '.example.com' AS domain,
         |       CAST(deg0.deg AS BIGINT) AS degree,
         |       CAST(COALESCE(degf.deg, 0) AS BIGINT) AS core_degree,
         |       CAST(COALESCE(degf.deg, 0) >= $CoreK AS INT) AS in_kcore
         |FROM deg0 LEFT JOIN degf ON degf.node = deg0.node
         |ORDER BY in_kcore DESC, core_degree DESC, domain""".stripMargin
    head + rounds + tail
  }

  // --- strongly connected components (FW-BW coloring) -------------------

  /** SCC fixture graph: the union of the two quadratic maps s → s²+1 and
    * s → s²+2 (mod 97) over the observed doc residues — unlike the
    * LinkDerivations permutations (whose union is one giant SCC), a
    * quadratic map is many-to-one, so trees hang off the cycles and the
    * component structure is genuinely mixed: one 67-node SCC, one
    * 2-cycle, 28 singletons at every test sf. */
  private[operators] def sccEdges(s: SparkSession, d: String): DataFrame =
    sccEdgesOf(Tables.documents(s, d))

  private[operators] def sccEdgesOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val res = docs.select(($"doc_id" % NDomains).cast("long").as("s")).distinct()
    Seq(1, 2).map { c =>
      res.select($"s".as("src"), (($"s" * $"s" + c) % NDomains).cast("long").as("dst"))
    }.reduce(_ unionAll _)
      .where($"src" =!= $"dst")
      .distinct()
  }

  /** Strongly connected components by forward–backward min-label coloring
    * (the Orzan/Slota BFS-coloring scheme — Slota, Rajamanickam &
    * Madduri 2014): repeat on the unassigned subgraph
    *
    *   1. COLOR: propagate min node id along edges to fixpoint —
    *      color(v) = min id that reaches v. Every member of an SCC gets
    *      the SAME color (mutual reachability), and a root r with
    *      color(r) = r is the minimum id of its own SCC.
    *   2. CARVE: from each root, mark backward (v → marked w, same
    *      color) to fixpoint — exactly SCC(r), carved for ALL roots of
    *      this round in parallel.
    *   3. Assign scc_id = color to the marked nodes, drop them, repeat.
    *
    * Every step is a join + aggregate in exact integer arithmetic
    * (bit-deterministic); `localCheckpoint` cuts each fixpoint's lineage
    * like the PageRank loop. Outer rounds are bounded by the SCC-DAG
    * depth; per-iteration work is O(|E|) — the Pregel shape. At 100 TB
    * you would add the standard size-1 trim step before coloring
    * (most web-graph nodes are trivial SCCs) — on the 97-node fixture
    * the untrimmed loop converges in a handful of rounds.
    *
    * Output (node, scc_id = min member id, scc_size), fully recomputed by
    * the DuckDB oracle via transitive closure + mutual-reachability. */
  def stronglyConnected(s: SparkSession, d: String): DataFrame =
    stronglyConnectedOf(sccEdges(s, d))

  /** Min-label fixpoint with POINTER JUMPING: each round relaxes one
    * edge hop AND shortcuts through the current label (label(v) ←
    * min over {label(v), labels of in/out-neighbors, label(label(v))}).
    * The shortcut is sound — label(v) = m certifies an m⇝v path (or
    * v⇝m when `backward`), and label(m) = m' certifies m'⇝m, so m'⇝v
    * composes — and it doubles the certified path length per round:
    * O(log diameter) rounds instead of the O(diameter) of plain
    * propagation (the 67-cycle fixture converges in 7 rounds, not 67). */
  private def minLabelFixpoint(e: DataFrame, init: DataFrame, backward: Boolean): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val (from, to) = if (backward) ("dst", "src") else ("src", "dst")
    var label = init.localCheckpoint()
    var moved = 1L
    while (moved > 0) {
      val relax = e.join(label.select($"node".as(from), $"label".as("lin")), from)
        .groupBy(col(to)).agg(min($"lin").as("lin"))
        .select(col(to).as("node"), $"lin")
      val jump = label.as("a")
        .join(label.as("b").select($"node".as("label"), $"label".as("ljmp")), "label")
        .select($"node", $"ljmp")
        .groupBy($"node").agg(min($"ljmp").as("ljmp"))
      val next = label
        .join(relax, Seq("node"), "left")
        .join(jump, Seq("node"), "left")
        .select($"node", least($"label",
          coalesce($"lin", $"label"), coalesce($"ljmp", $"label")).as("label"))
        .localCheckpoint()
      moved = next.as("n").join(label.as("o"), "node")
        .where(col("n.label") =!= col("o.label")).count()
      label = next
    }
    label
  }

  /** Driver/distributed split, the [[Dedup]] connected-components
    * precedent verbatim: below `driverLimit` edges the graph is driver-
    * trivial and an iterative Tarjan (explicit stack — a 67-cycle would
    * blow a recursive one's frames at larger sizes) answers in one
    * collect; above it, the distributed FW-BW loop. SccEquivalenceSpec
    * (in GraphSpec) proves both paths agree on the same graphs, so the
    * fast path can never drift from the scale path. */
  private[operators] def stronglyConnectedOf(
      edgesIn: DataFrame, driverLimit: Long = 2000000L): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    // persist across the path decision AND the chosen path's read —
    // without it the sizing count and the Tarjan collect (or the
    // distributed loop's first iteration) each re-run the derived
    // edge pipeline from scratch
    val edges = edgesIn.persist()
    try {
      val nEdges = edges.count()
      if (nEdges <= driverLimit) sccTarjan(edges)
      else stronglyConnectedDistributed(edges)
    } finally edges.unpersist(blocking = false)
  }

  /** Iterative (explicit-stack) Tarjan over a driver-collected edge list —
    * the ≤2M-edge fast path. */
  private[operators] def sccTarjan(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val es = edgesIn.select($"src", $"dst").as[(Long, Long)].collect()
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val index = scala.collection.mutable.HashMap.empty[Long, Int]
    val low = scala.collection.mutable.HashMap.empty[Long, Int]
    val onStack = scala.collection.mutable.HashSet.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sccId = scala.collection.mutable.HashMap.empty[Long, Long]
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // work stack of (node, next-child offset)
      val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
      while (work.nonEmpty) {
        val (v, ci) = work.last
        if (ci == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stack += v; onStack += v
        }
        val children = adj.getOrElse(v, Array.empty[Long])
        if (ci < children.length) {
          work(work.length - 1) = (v, ci + 1)
          val w = children(ci)
          if (!index.contains(w)) work += ((w, 0))
          else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
            var done = false
            while (!done) {
              val w = stack.remove(stack.length - 1)
              onStack -= w; comp += w
              if (w == v) done = true
            }
            val m = comp.min
            comp.foreach(w => sccId(w) = m)
          }
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val (p, _) = work.last
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    val sizes = sccId.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    nodes.toSeq.map(v => (v, sccId(v), sizes(sccId(v)))).toDF("node", "scc_id", "scc_size")
      .orderBy($"node")
  }

  private[operators] def stronglyConnectedDistributed(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val edges = edgesIn.select($"src", $"dst").persist()
    val allNodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct()
    var active = allNodes.localCheckpoint()
    var assigned = s.emptyDataset[(Long, Long)].toDF("node", "scc_id")
    var remaining = active.count()
    while (remaining > 0) {
      val e = edges
        .join(active.select($"node".as("src")), "src")
        .join(active.select($"node".as("dst")), "dst")
        .select($"src", $"dst").localCheckpoint()
      // 1. COLOR: forward min-label (with jumping) — color(v) = min id
      //    that reaches v within the active subgraph
      val color = minLabelFixpoint(e,
        active.select($"node", $"node".as("label")), backward = false)
        .withColumnRenamed("label", "color")
      // 2. CARVE: backward min-label WITHIN color — bmin(v) = min id v
      //    reaches through same-color nodes. SCC members of root r have
      //    bmin = r = color (mutual reachability); same-color non-members
      //    cannot reach r (that would make them members), and every
      //    color-r node has id ≥ r, so bmin ≠ color exactly characterizes
      //    non-members. Same jumping trick, reversed edges.
      val cm = color.select($"node", $"color")
      val ec = e
        .join(cm.select($"node".as("src"), $"color".as("cs")), "src")
        .join(cm.select($"node".as("dst"), $"color".as("cd")), "dst")
        .where($"cs" === $"cd")
        .select($"src", $"dst").localCheckpoint()
      val bmin = minLabelFixpoint(ec,
        active.select($"node", $"node".as("label")), backward = true)
      val marked = color.join(bmin, "node")
        .where($"color" === $"label")
        .select($"node", $"color").localCheckpoint()
      // 3. assign and shrink
      assigned = assigned
        .unionByName(marked.select($"node", $"color".as("scc_id")))
        .localCheckpoint()
      active = active.join(marked.select($"node"), Seq("node"), "left_anti")
        .localCheckpoint()
      remaining = active.count()
    }
    edges.unpersist(blocking = false)
    val sizes = assigned.groupBy($"scc_id").agg(count(lit(1)).as("scc_size"))
    assigned.join(sizes, "scc_id")
      .select($"node", $"scc_id", $"scc_size")
      .orderBy($"node")
  }

  val sccOracle: String =
    s"""WITH RECURSIVE
       |docs97 AS (SELECT DISTINCT doc_id % $NDomains AS s FROM documents),
       |edges AS (
       |  SELECT DISTINCT s AS src, (s*s + 1) % $NDomains AS dst FROM docs97
       |  WHERE s != (s*s + 1) % $NDomains
       |  UNION
       |  SELECT DISTINCT s, (s*s + 2) % $NDomains FROM docs97
       |  WHERE s != (s*s + 2) % $NDomains),
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |mutual AS (
       |  SELECT a.src AS v, a.dst AS u
       |  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src),
       |sid AS (
       |  SELECT n.node, least(n.node, coalesce(min(m.u), n.node)) AS scc_id
       |  FROM nodes n LEFT JOIN mutual m ON m.v = n.node GROUP BY n.node),
       |sizes AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
       |          FROM sid GROUP BY 1)
       |SELECT CAST(sid.node AS BIGINT) AS node,
       |       CAST(sid.scc_id AS BIGINT) AS scc_id, sizes.scc_size
       |FROM sid JOIN sizes USING (scc_id) ORDER BY node""".stripMargin

  /** Personalized PageRank from a trusted seed set — the seed-expansion
    * primitive of corpus curation (rank the whole host graph by proximity
    * to hand-vetted domains, then admit by PPR threshold; the
    * link-based counterpart of the seeded quality classifier): identical
    * damped integer iteration to [[domainRank]], but the teleport mass
    * (1−d) returns ONLY to the seeds instead of uniformly — so rank
    * concentrates in the seeds' link neighborhood. Seeds here are the
    * domains ≡ 0 (mod 10), standing in for the curated allowlist.
    *
    * Same exactness contract (integer fixed point, `div` truncation
    * agreeing across engines) and same Pregel scale shape as
    * [[domainRank]]; the only new state is the seed membership flag. */
  def pprSeeded(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // degree pre-join + checkpoint reclamation — the domainRank shape
    val edges = domainEdges(s, d)
      .join(domainEdges(s, d).groupBy($"src").agg(count(lit(1)).as("odeg")), "src")
      .localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct().localCheckpoint()
    val isSeed = ($"node" % 10 === 0)
    val nSeeds = nodes.where(isSeed).count()
    val seedBase = (15L * Scale) / (100L * nSeeds)
    val init = Scale / nodes.count()

    var ranks = nodes.withColumn("r", lit(init)).localCheckpoint()
    for (_ <- 1 to Iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst", expr("r div odeg").as("share"))
        .groupBy($"dst").agg(sum($"share").as("contrib"))
      val prev = ranks
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select($"node",
          (when(isSeed, lit(seedBase)).otherwise(lit(0L)) +
            expr("(85 * coalesce(contrib, 0L)) div 100")).as("r"))
        .localCheckpoint()
      SessionCaches.freeLocalCheckpoint(prev)
    }
    SessionCaches.freeLocalCheckpoint(edges)
    SessionCaches.freeLocalCheckpoint(nodes)
    ranks
      .select(
        concat(lit("d"), $"node", lit(".example.com")).as("domain"),
        isSeed.as("is_seed"),
        $"r".as("ppr_scaled"))
      .orderBy($"ppr_scaled".desc, $"domain")
  }

  /** Fully independent oracle: same unrolled-CTE replay as
    * [[domainRankOracle]] with the seed-restricted teleport term. */
  val pprSeededOracle: String = {
    val edgeUnion = EdgeUnionSql
    val head =
      s"""WITH edges AS (SELECT DISTINCT src, dst FROM ($edgeUnion) WHERE src <> dst),
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |odeg AS (SELECT src AS node, count(*) AS odeg FROM edges GROUP BY src),
         |n AS (SELECT count(*) AS n,
         |             sum(CASE WHEN node % 10 = 0 THEN 1 ELSE 0 END) AS ns
         |      FROM nodes),
         |r0 AS (SELECT node, CAST($Scale // n.n AS BIGINT) AS r
         |       FROM nodes CROSS JOIN n)""".stripMargin
    val iters = (1 to Iters).map { i =>
      val prev = s"r${i - 1}"
      s""",
         |c$i AS (SELECT e.dst AS node, CAST(sum(p.r // o.odeg) AS BIGINT) AS contrib
         |        FROM edges e JOIN $prev p ON e.src = p.node
         |        JOIN odeg o ON e.src = o.node
         |        GROUP BY e.dst),
         |r$i AS (SELECT nodes.node,
         |               CAST(CASE WHEN nodes.node % 10 = 0
         |                         THEN (15 * $Scale) // (100 * n.ns) ELSE 0 END
         |                    + (85 * COALESCE(c$i.contrib, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node CROSS JOIN n)""".stripMargin
    }.mkString
    val tail =
      s"""
         |SELECT 'd' || CAST(node AS VARCHAR) || '.example.com' AS domain,
         |       node % 10 = 0 AS is_seed,
         |       r AS ppr_scaled
         |FROM r$Iters
         |ORDER BY ppr_scaled DESC, domain""".stripMargin
    head + iters + tail
  }

  val defs: Seq[Q] = Seq(
    Q("graph_domain_rank", Some(domainRankOracle), domainRank),
    Q("graph_ppr_seeded", Some(pprSeededOracle), pprSeeded),
    Q("graph_pagerank_cert", Some(pagerankCertificateOracle), pagerankCertificate),
    Q("graph_harmonic_centrality", Some(harmonicCentralityOracle), harmonicCentrality),
    Q("graph_harmonic_hll", Some(harmonicHyperBallOracle), harmonicHyperBall),
    Q("graph_effective_diameter", Some(effectiveDiameterOracle), effectiveDiameter),
    Q("graph_triangles", Some(triangleCountsOracle), triangleCounts),
    // refresh ≡ rebuild exactly, so the incremental path is gated against
    // the FULL-REBUILD oracle — any drift in the delta algebra fails hard
    Q("graph_triangles_incremental", Some(triangleCountsOracle), triangleCountsIncremental),
    Q("graph_kcore", Some(kCoreOracle), kCore),
    Q("graph_scc", Some(sccOracle), stronglyConnected))
}

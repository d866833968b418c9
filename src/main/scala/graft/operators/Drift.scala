package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-drift monitoring — the statistical tripwires a production
  * training-data pipeline runs between corpus snapshots / ingest windows
  * before letting a new batch into the training mix: a chi-square
  * independence test over two categorical dimensions and the Population
  * Stability Index over a binned numeric distribution.
  *
  * Scale shape: both are ONE map-side-combinable aggregation over the
  * full table down to a bounded cell grid (|langs|×|sources|, or a fixed
  * bin count), then pure arithmetic on that tiny grid — the canonical
  * sketch-then-compute split. Nothing per-row ever reaches the driver;
  * adding a monitored dimension adds a grid, not a pass.
  *
  * Cross-engine determinism: cell counts are exact integers; each cell's
  * double contribution is computed with identical operation order on both
  * engines, quantized to DECIMAL(28,8), and summed in exact decimal (the
  * [[Search.bm25TopK]] / [[CorpusDedup]] idiom), so the 4-dp round can
  * never flip on summation order.
  */
object Drift {

  /** Chi-square test of independence for documents' lang × source: the
    * "did my language mix shift per source?" alarm. Output is one row:
    * the statistic, degrees of freedom, and the grid size it came from.
    * The full grid (including unobserved cells, whose expected counts
    * still contribute) is formed by crossing the marginals. */
  def chi2LangSource(s: SparkSession, d: String): DataFrame =
    chi2Of(Tables.documents(s, d))

  def chi2Of(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    chi2OfCells(docs.groupBy($"lang", $"source").agg(count(lit(1)).as("o")))
  }

  /** [[chi2Of]] from a pre-built (lang, source, o) observed-cell census —
    * the entry the CONTINUOUSLY-MAINTAINED cell view serves from
    * ([[graft.streaming.CorpusStream.upsertContingencyRollup]]): cell
    * counts are additive, so the maintained view IS the census and the
    * statistic never re-touches raw documents. */
  def chi2OfCells(cellsIn: DataFrame): DataFrame = {
    val s = cellsIn.sparkSession
    import s.implicits._
    // ONE pass over the table: the marginals and the grand total are sums
    // over the observed-cell aggregate (every doc lands in a cell), so
    // they derive from `cells`, never from re-scanning docs.
    val cells = cellsIn.persist()
    val rows = cells.groupBy($"lang").agg(sum($"o").as("rn"))
    val cols = cells.groupBy($"source").agg(sum($"o").as("cn"))
    val n = cells.agg(sum($"o")).head().getLong(0)
    // Only OBSERVED cells are materialized. Unobserved cells contribute
    // (0−E)²/E = E, and Σ_all E = N exactly, so
    //   χ² = Σ_obs[(O−E)²/E] + (N − Σ_obs E)
    // — the sparse-contingency identity. At scale this matters: the
    // observed cells are at most the data, while the crossed grid
    // |langs|×|sources| can dwarf it (and would need a nested-loop cross).
    val grid = cells
      .join(broadcast(rows), "lang")
      .join(broadcast(cols), "source")
    val e = $"rn" * $"cn" / lit(n.toDouble)
    val contrib = ($"o" - e) * ($"o" - e) / e
    val out = grid.agg(
        round(
          sum(contrib.cast("decimal(28,8)")) - sum(e.cast("decimal(28,8)")) +
            lit(n).cast("decimal(28,8)"), 4).cast("double").as("chi2"),
        ((countDistinct($"lang") - 1) * (countDistinct($"source") - 1)).as("dof"),
        (countDistinct($"lang") * countDistinct($"source")).as("n_cells"))
      .orderBy($"chi2")
    // one-row result: materialize and release the persisted cell census
    val rows0 = java.util.Arrays.asList(out.collect(): _*)
    cells.unpersist(blocking = false)
    s.createDataFrame(rows0, out.schema)
  }

  val chi2LangSourceOracle: String =
    """WITH cells AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, count(*) AS rn FROM documents GROUP BY 1),
      |c AS (SELECT source, count(*) AS cn FROM documents GROUP BY 1),
      |n AS (SELECT count(*) * 1.0 AS n, count(*) AS nc FROM documents),
      |grid AS (
      |  SELECT cells.lang, cells.source, r.rn, c.cn, cells.o
      |  FROM cells JOIN r ON cells.lang = r.lang
      |             JOIN c ON cells.source = c.source)
      |SELECT
      |  CAST(round(sum(CAST((o - rn * cn / n) * (o - rn * cn / n) / (rn * cn / n)
      |                      AS DECIMAL(28,8)))
      |             - sum(CAST(rn * cn / n AS DECIMAL(28,8)))
      |             + CAST(nc AS DECIMAL(28,8)), 4) AS DOUBLE) AS chi2,
      |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
      |  CAST(count(DISTINCT lang) * count(DISTINCT source) AS BIGINT) AS n_cells
      |FROM grid CROSS JOIN n
      |GROUP BY nc""".stripMargin

  /** PSI of the event `value` distribution, week 1 vs week 2 of the
    * stream, over 10 fixed-width bins on [0, 500) (the synthetic range;
    * production bins come from the reference window's quantiles). Laplace
    * (+1) smoothing keeps empty bins finite and both engines identical.
    * PSI < 0.1 is conventionally "no shift" — the report emits per-bin
    * contributions plus the total under bin = -1, so the alarm and its
    * explanation come from the same scan. */
  def psiValueDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .filter($"ts" >= "2024-01-01" && $"ts" < "2024-01-15")
    val binned = ev.select(
      least(floor($"value" / 50.0), lit(9L)).cast("long").as("bin"),
      when($"ts" < "2024-01-08", lit("a")).otherwise(lit("b")).as("win"))
    // Dense bin spine: an empty bin still contributes its smoothed mass
    // (and its absence from the report would hide exactly the interesting
    // case — all of a bin's mass draining away between windows).
    val counts = s.sql("SELECT explode(sequence(0, 9)) AS bin")
      .select($"bin".cast("long").as("bin"))
      .join(
        binned.groupBy($"bin").agg(
          sum(when($"win" === "a", 1L).otherwise(0L)).as("an"),
          sum(when($"win" === "b", 1L).otherwise(0L)).as("bn")),
        Seq("bin"), "left")
      .select($"bin", coalesce($"an", lit(0L)).as("an"), coalesce($"bn", lit(0L)).as("bn"))
    // Bounded grid from here on: persist the 10-row bin census, read the
    // two window totals back as DRIVER SCALARS (exact longs — the
    // [[Search.bm25TopK]] N/avgdl idiom; RankStats precedent for bounded
    // driver data), and inline them as literals. No totals join exists in
    // the plan at all — a constant-key join would constant-fold into the
    // nested-loop shape PlanHygieneSpec forbids. The tiny result is then
    // materialized and the census released.
    val cached = counts.persist()
    val totRow = cached.agg(sum($"an"), sum($"bn")).head()
    val (ta, tb) = (totRow.getLong(0), totRow.getLong(1))
    val p = ($"an" + lit(1.0)) / lit(ta + 10.0)
    val q = ($"bn" + lit(1.0)) / lit(tb + 10.0)
    val contrib = (p - q) * log(p / q)
    val perBin = cached.select($"bin",
      round(contrib.cast("decimal(28,8)"), 6).cast("double").as("psi"))
    val total = cached.agg(
      lit(-1L).as("bin"),
      round(sum(contrib.cast("decimal(28,8)")).cast("double"), 6).as("psi"))
    val out = perBin.unionAll(total).orderBy($"bin")
    val rows = java.util.Arrays.asList(out.collect(): _*)
    cached.unpersist(blocking = false)
    s.createDataFrame(rows, out.schema)
  }

  val psiValueDriftOracle: String =
    """WITH ev AS (
      |  SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin,
      |         CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 'a' ELSE 'b' END AS win
      |  FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'),
      |obs AS (
      |  SELECT bin,
      |         sum(CASE WHEN win = 'a' THEN 1 ELSE 0 END) AS an,
      |         sum(CASE WHEN win = 'b' THEN 1 ELSE 0 END) AS bn
      |  FROM ev GROUP BY 1),
      |counts AS (
      |  SELECT s.bin, coalesce(obs.an, 0) AS an, coalesce(obs.bn, 0) AS bn
      |  FROM (SELECT unnest(generate_series(0, 9)) AS bin) s
      |  LEFT JOIN obs ON obs.bin = s.bin),
      |tot AS (SELECT sum(an) AS ta, sum(bn) AS tb FROM counts),
      |g AS (SELECT * FROM counts CROSS JOIN tot)
      |SELECT bin, CAST(round(CAST(
      |         ((an + 1.0) / (ta + 10.0) - (bn + 1.0) / (tb + 10.0))
      |         * ln(((an + 1.0) / (ta + 10.0)) / ((bn + 1.0) / (tb + 10.0)))
      |       AS DECIMAL(28,8)), 6) AS DOUBLE) AS psi
      |FROM g
      |UNION ALL
      |SELECT -1, CAST(round(CAST(sum(CAST(
      |         ((an + 1.0) / (ta + 10.0) - (bn + 1.0) / (tb + 10.0))
      |         * ln(((an + 1.0) / (ta + 10.0)) / ((bn + 1.0) / (tb + 10.0)))
      |       AS DECIMAL(28,8))) AS DOUBLE), 6) AS DOUBLE)
      |FROM g
      |ORDER BY bin""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov statistic between the `value`
    * distributions of two event types — the nonparametric member of the
    * drift family (χ² needs categories, PSI needs bins chosen up front;
    * KS compares the full ECDFs with no binning decision at all).
    *
    * Exactness: over discrete samples,
    * D = max over observed v of |F_A(v) − F_B(v)| with F(v) = P(X ≤ v),
    * and D·n_A·n_B = max |cumA(v)·n_B − cumB(v)·n_A| is an INTEGER — the
    * query outputs that scaled integer (`d_scaled`) plus the decimal-
    * quantized double readout, so both engines agree bit-for-bit
    * (overflow bound: cum·n ≤ n_A·n_B, int64-safe to ~3×10⁹ rows per
    * side — beyond that, pre-aggregate into value buckets first).
    *
    * Scale shape — the RankStats two-level pattern, NO single-partition
    * sort (`sum() OVER (ORDER BY v)` with no partition is the classic
    * scale-killer this operator refuses): (1) one hash aggregation to
    * distinct values carrying per-side counts; (2) range-bucket the
    * values (approxQuantile bounds, ~32 doubles to the driver);
    * (3) per-bucket (cntA, cntB) totals → exclusive prefix offsets (a
    * ≤32-row bounded collect, broadcast back); (4) per-bucket ordered
    * window cumsum + offset = exact global cumulative, every bucket
    * sorting in parallel; (5) one max-aggregate. */
  /** Shared core for the two-sample rank statistics (KS, Mann–Whitney):
    * per DISTINCT value v of the two samples, the per-side counts
    * (ca, cb) and exact INCLUSIVE global cumulatives (cuma, cumb),
    * computed with the RankStats two-level pattern, plus the side totals
    * (na, nb) as driver scalars (read off the bounded per-bucket
    * aggregate — no extra pass). */
  private def sideCumulatives(s: SparkSession, d: String,
      typeA: String, typeB: String): (DataFrame, Long, Long) = {
    import s.implicits._
    val pts = Tables.events(s, d)
      .filter($"value".isNotNull && $"event_type".isin(typeA, typeB))
      .select($"value".as("v"),
        when($"event_type" === typeA, 1L).otherwise(0L).as("a"),
        when($"event_type" === typeB, 1L).otherwise(0L).as("b"))
      .groupBy($"v")
      .agg(sum($"a").as("ca"), sum($"b").as("cb"))
    val bounds = RankStats.rangeBounds(pts, "v", RankStats.DefaultBuckets)
    val bucketed = pts.withColumn("__bucket", RankStats.bucketOf($"v", bounds))
    // per-bucket per-side totals → exclusive prefix offsets; ≤ buckets
    // rows to the driver (the RankStats bucketOffsets shape, two sums)
    val perBucket = bucketed.groupBy($"__bucket")
      .agg(sum($"ca").as("sa"), sum($"cb").as("sb"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offA = perBucket.scanLeft(0L)(_ + _._2).init
    val offB = perBucket.scanLeft(0L)(_ + _._3).init
    val na = perBucket.map(_._2).sum
    val nb = perBucket.map(_._3).sum
    val offsets = s.createDataFrame(
      perBucket.map(_._1).zip(offA.zip(offB)).map { case (bk, (oa, ob)) => (bk, oa, ob) }.toSeq)
      .toDF("__bucket", "__offa", "__offb")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"__bucket").orderBy($"v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .select($"__bucket", $"v", $"ca", $"cb",
        ($"__offa" + sum($"ca").over(w)).as("cuma"),
        ($"__offb" + sum($"cb").over(w)).as("cumb"))
    (cum, na, nb)
  }

  /** Degenerate-input guard shared by the two-sample trio: with either
    * side empty the statistics are undefined (denominator na·nb = 0 —
    * the aggregate would emit one NaN/null row), so BOTH engines return
    * ZERO rows: Spark via this limit(0), each oracle via its
    * `WHERE na > 0 AND nb > 0`. This is the input a drift monitor hits
    * first (a brand-new source with no purchases yet); na/nb are
    * already driver scalars, so the guard costs nothing. */
  private def emptySideGuard(result: DataFrame, na: Long, nb: Long): DataFrame =
    if (na == 0 || nb == 0) result.limit(0) else result

  def ksValueDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (cum, na, nb) = sideCumulatives(s, d, "view", "purchase")
    emptySideGuard(
      cum.select(($"cuma" * nb - $"cumb" * na).as("diff"))
        .agg(max(abs($"diff")).as("d_scaled"))
        .select(lit(na).as("na"), lit(nb).as("nb"), $"d_scaled",
          round(($"d_scaled".cast("double") / lit(na.toDouble * nb))
            .cast("decimal(28,8)"), 6).cast("double").as("ks_stat")),
      na, nb)
  }

  val ksValueDriftOracle: String =
    """WITH s AS (
      |  SELECT value AS v,
      |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
      |pts AS (
      |  SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      |  FROM s GROUP BY v),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM s),
      |cum AS (
      |  SELECT CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
      |         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
      |  FROM pts)
      |SELECT na, nb,
      |       CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_scaled,
      |       CAST(round(CAST(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
      |              / (CAST(na AS DOUBLE) * nb) AS DECIMAL(28,8)), 6) AS DOUBLE) AS ks_stat
      |FROM cum CROSS JOIN tot
      |WHERE na > 0 AND nb > 0
      |GROUP BY na, nb""".stripMargin

  /** Exact Mann–Whitney U between the same two samples as
    * [[ksValueDrift]] — KS alarms on ANY distributional difference, MWU
    * answers the directional question, and its normalization U/(n_A·n_B)
    * is exactly the AUC / common-language effect size for side A:
    * P(A > B) + ½P(A = B) with A = `typeA` (view), B = `typeB`
    * (purchase). U here is U_A = R_A − n_A(n_A+1)/2, the count of
    * (a, b) pairs with a > b plus half the ties — so HIGH auc means
    * VIEWS sit at higher values than purchases, auc ≈ 0.5 means no
    * shift, and "purchases shifted toward higher values" reads as auc
    * BELOW 0.5 (sanity anchor: A = {1}, B = {2} gives auc = 0).
    *
    * Exactness with ties: using midranks, 2·midrank(v) = 2·lt(v) + t(v)
    * + 1 (lt = rows strictly below v, t = ties at v) is an INTEGER, so
    * 2R_A = Σ_v ca(v)·(2·lt(v) + t(v) + 1) and U2 = 2U = 2R_A −
    * n_A(n_A+1) are exact int64 (bound: 2R_A ≤ 2·n_A·n — safe to ~10⁹
    * rows per side). The double readout quantizes U2/(2·n_A·n_B)
    * through the decimal idiom. Same one-shuffle two-level plan as KS
    * (shared [[sideCumulatives]]); the extra statistic costs one more
    * sum over the distinct-value relation, not a pass over the data. */
  def mwuValueDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (cum, na, nb) = sideCumulatives(s, d, "view", "purchase")
    val lt = ($"cuma" - $"ca") + ($"cumb" - $"cb")
    val t = $"ca" + $"cb"
    emptySideGuard(
      cum.select(($"ca" * (lt * 2L + t + 1L)).as("r2"))
        .agg(sum($"r2").as("r2a"))
        .select(lit(na).as("na"), lit(nb).as("nb"),
          ($"r2a" - lit(na * (na + 1L))).as("u2"),
          round((($"r2a" - lit(na * (na + 1L))).cast("double") /
            lit(2.0 * na * nb)).cast("decimal(28,8)"), 6)
            .cast("double").as("auc")),
      na, nb)
  }

  val mwuValueDriftOracle: String =
    """WITH s AS (
      |  SELECT value AS v,
      |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
      |pts AS (
      |  SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      |  FROM s GROUP BY v),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM s),
      |cum AS (
      |  SELECT ca, cb,
      |         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
      |         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
      |  FROM pts),
      |r AS (
      |  SELECT CAST(sum(ca * (((cuma - ca) + (cumb - cb)) * 2 + (ca + cb) + 1)) AS BIGINT) AS r2a
      |  FROM cum)
      |SELECT na, nb,
      |       CAST(r2a - na * (na + 1) AS BIGINT) AS u2,
      |       CAST(round(CAST(CAST(r2a - na * (na + 1) AS DOUBLE)
      |              / (2.0 * na * nb) AS DECIMAL(28,8)), 6) AS DOUBLE) AS auc
      |FROM r CROSS JOIN tot
      |WHERE na > 0 AND nb > 0""".stripMargin

  /** Exact Wasserstein-1 (earth-mover) distance between the same two
    * samples as [[ksValueDrift]], completing the drift trio: KS is the
    * SUP of the CDF gap (one bad point trips it), MWU is the rank
    * direction, W1 is the AREA between the CDFs — the "how much value
    * mass actually has to move" number, in the column's own units, that
    * a mixture-rebalancing decision wants.
    *
    * W1 = ∫|F_A − F_B| dx = Σ over consecutive distinct values
    * |cuma·n_B − cumb·n_A| · (next(v) − v) / (n_A·n_B), with the
    * integer-scaled CDF gap exact (shared [[sideCumulatives]] core) and
    * the per-gap double term quantized to DECIMAL(28,8) before the exact
    * decimal sum (the [[psiValueDrift]] idiom).
    *
    * The global max needs no successor: its CDF gap is identically zero
    * (cuma = n_A, cumb = n_B), so its term vanishes — coalesce(gap, 0).
    * next(v) itself is a lead WITHIN each range bucket (every bucket in
    * parallel, no single-partition window); only each bucket's FIRST
    * value — ≤ buckets rows, already on the driver's bounded per-bucket
    * pass — crosses bucket seams, broadcast back as the previous
    * bucket's seam successor. */
  def wassersteinValueDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (cum, na, nb) = sideCumulatives(s, d, "view", "purchase")
    val firsts = cum.groupBy($"__bucket").agg(min($"v").as("fv"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val seam = firsts.zip(firsts.drop(1)).map { case ((bk, _), (_, nextFv)) =>
      (bk, nextFv)
    }
    val seamDf = s.createDataFrame(seam.toSeq).toDF("__bucket", "__seam_next")
    val wLead = org.apache.spark.sql.expressions.Window
      .partitionBy($"__bucket").orderBy($"v")
    val gap = coalesce(
      coalesce(lead($"v", 1).over(wLead), $"__seam_next") - $"v", lit(0.0))
    val term = abs($"cuma" * nb - $"cumb" * na).cast("double") * gap
    emptySideGuard(
      cum.join(broadcast(seamDf), Seq("__bucket"), "left")
        .select(term.cast("decimal(28,8)").as("t"))
        .agg(sum($"t").as("w1_scaled"))
        .select(lit(na).as("na"), lit(nb).as("nb"),
          round(($"w1_scaled".cast("double") / lit(na.toDouble * nb))
            .cast("decimal(28,8)"), 6).cast("double").as("w1")),
      na, nb)
  }

  val wassersteinValueDriftOracle: String =
    """WITH s AS (
      |  SELECT value AS v,
      |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
      |pts AS (
      |  SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      |  FROM s GROUP BY v),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM s),
      |cum AS (
      |  SELECT v,
      |         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
      |         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
      |         lead(v) OVER (ORDER BY v) AS nv
      |  FROM pts),
      |terms AS (
      |  SELECT CAST(CAST(abs(cuma * nb - cumb * na) AS DOUBLE)
      |              * coalesce(nv - v, 0.0) AS DECIMAL(28,8)) AS t
      |  FROM cum CROSS JOIN tot)
      |SELECT na, nb,
      |       CAST(round(CAST(CAST(sum(t) AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
      |                       AS DECIMAL(28,8)), 6) AS DOUBLE) AS w1
      |FROM terms CROSS JOIN tot
      |WHERE na > 0 AND nb > 0
      |GROUP BY na, nb""".stripMargin

  /** Benford first-significant-digit audit over positive event values —
    * the classic "does this numeric column look organically generated?"
    * tripwire (fabricated or truncated feeds flunk it; it is also a fine
    * canary for unit mix-ups, e.g. dollars suddenly arriving as cents).
    * Output: per digit 1–9 the observed count, the Benford-expected
    * count n·log10(1+1/d), and the χ² term, plus the digit = -1 total.
    *
    * Cross-engine determinism: the first digit is extracted WITHOUT
    * log10-of-double (floor(log10(v)) is off-by-one when log10 lands a
    * 1-ulp short of an integer — the v = 1000.0 trap): m =
    * floor(v·10⁶) is an exact IEEE multiply+floor in both engines, and
    * the first digit of the INTEGER m (= first significant digit of v
    * for v ≥ 10⁻⁶) comes from integer-to-string, which is exact
    * everywhere. Expected masses use the same literal expression
    * log10(1 + 1/d) on both engines and decimal-quantized sums (the
    * [[psiValueDrift]] idiom). One aggregation pass to a 9-cell grid. */
  def benfordValueDigits(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = floor($"value" * lit(1000000.0)).cast("long")
    val digits = Tables.events(s, d)
      .filter($"value".isNotNull && m > 0L)
      .select(substring(m.cast("string"), 1, 1).cast("long").as("digit"))
    val counts = s.sql("SELECT explode(sequence(1, 9)) AS digit")
      .select($"digit".cast("long").as("digit"))
      .join(digits.groupBy($"digit").agg(count(lit(1)).as("obs")),
        Seq("digit"), "left")
      .select($"digit", coalesce($"obs", lit(0L)).as("obs"))
    val cached = counts.persist()
    val n = cached.agg(sum($"obs")).head().getLong(0)
    val e = lit(n.toDouble) * log10(lit(1.0) + lit(1.0) / $"digit".cast("double"))
    val term = ($"obs".cast("double") - e) * ($"obs".cast("double") - e) / e
    val perDigit = cached.select($"digit", $"obs",
      round(e.cast("decimal(28,8)"), 4).cast("double").as("expected"),
      round(term.cast("decimal(28,8)"), 4).cast("double").as("chi2"))
    val total = cached.agg(
      lit(-1L).as("digit"), sum($"obs").as("obs"),
      round(sum(e.cast("decimal(28,8)")), 4).cast("double").as("expected"),
      round(sum(term.cast("decimal(28,8)")), 4).cast("double").as("chi2"))
    val out = perDigit.unionAll(total).orderBy($"digit")
    val rows = java.util.Arrays.asList(out.collect(): _*)
    cached.unpersist(blocking = false)
    s.createDataFrame(rows, out.schema)
  }

  val benfordValueDigitsOracle: String =
    """WITH m AS (
      |  SELECT CAST(floor(value * 1000000.0) AS BIGINT) AS m
      |  FROM events WHERE value IS NOT NULL AND floor(value * 1000000.0) > 0),
      |dg AS (SELECT CAST(substr(CAST(m AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM m),
      |obs AS (SELECT digit, count(*) AS obs FROM dg GROUP BY 1),
      |counts AS (
      |  SELECT s.digit, coalesce(obs.obs, 0) AS obs
      |  FROM (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) AS digit) s
      |  LEFT JOIN obs ON obs.digit = s.digit),
      |tot AS (SELECT CAST(sum(obs) AS DOUBLE) AS n FROM counts),
      |g AS (SELECT digit, obs, n * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS e
      |      FROM counts CROSS JOIN tot)
      |SELECT digit, CAST(obs AS BIGINT) AS obs,
      |       CAST(round(CAST(e AS DECIMAL(28,8)), 4) AS DOUBLE) AS expected,
      |       CAST(round(CAST((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e
      |                  AS DECIMAL(28,8)), 4) AS DOUBLE) AS chi2
      |FROM g
      |UNION ALL
      |SELECT -1, CAST(sum(obs) AS BIGINT),
      |       CAST(round(sum(CAST(e AS DECIMAL(28,8))), 4) AS DOUBLE),
      |       CAST(round(sum(CAST((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e
      |                  AS DECIMAL(28,8))), 4) AS DOUBLE)
      |FROM g
      |ORDER BY digit""".stripMargin

  /** Mutual information of documents' lang × source — the
    * information-theoretic complement to [[chi2LangSource]]: χ² answers
    * "is the association statistically surprising?"; MI answers "how many
    * nats does knowing the source tell you about the language?" — the
    * quantity a corpus-mixing plan actually budgets (a high-NMI pair
    * means the two stratification dimensions are redundant and the
    * mixture grid can be collapsed). One row: MI, the three entropies it
    * decomposes into, and NMI = MI/√(H(X)·H(Y)) ∈ [0,1].
    *
    * Scale shape: identical to χ² — one map-side-combinable aggregation
    * to the observed-cell grid, marginals derived FROM the grid (never a
    * rescan), tiny broadcast joins. Sparser than χ²: unobserved cells
    * contribute exactly 0 to every term, so no correction identity is
    * even needed.
    *
    * Cross-engine determinism: the [[chi2Of]] idiom — per-cell double
    * contributions with identical operation order on both engines,
    * quantized to DECIMAL(28,8), summed in exact decimal, rounded. NMI is
    * derived from the ROUNDED components (÷ and √ are correctly rounded
    * IEEE ops, so identical inputs give identical doubles). */
  def miLangSource(s: SparkSession, d: String): DataFrame =
    miOf(Tables.documents(s, d))

  def miOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    miOfCells(docs.groupBy($"lang", $"source").agg(count(lit(1)).as("o")))
  }

  /** [[miOf]] from a pre-built observed-cell census — see
    * [[chi2OfCells]]; the same maintained view serves both statistics. */
  def miOfCells(cellsIn: DataFrame): DataFrame = {
    val s = cellsIn.sparkSession
    import s.implicits._
    val cells = cellsIn.persist()
    val rows = cells.groupBy($"lang").agg(sum($"o").as("rn"))
    val cols = cells.groupBy($"source").agg(sum($"o").as("cn"))
    val n = cells.agg(sum($"o")).head().getLong(0)
    val nD = lit(n.toDouble)
    val p = $"o".cast("double") / nD
    val px = $"rn".cast("double") / nD
    val py = $"cn".cast("double") / nD
    val grid = cells.join(broadcast(rows), "lang").join(broadcast(cols), "source")
    val joint = grid.agg(
      round(sum((p * log(p / (px * py))).cast("decimal(28,8)")), 6)
        .cast("double").as("mi"),
      round(-sum((p * log(p)).cast("decimal(28,8)")), 6)
        .cast("double").as("h_joint"),
      count(lit(1)).as("n_cells")).withColumn("k", lit(1))
    val hx = rows.agg(round(-sum((px * log(px)).cast("decimal(28,8)")), 6)
      .cast("double").as("h_lang")).withColumn("k", lit(1))
    val hy = cols.agg(round(-sum((py * log(py)).cast("decimal(28,8)")), 6)
      .cast("double").as("h_source")).withColumn("k", lit(1))
    val out = joint.join(broadcast(hx), "k").join(broadcast(hy), "k")
      .select($"mi",
        round(($"mi" / sqrt($"h_lang" * $"h_source")).cast("decimal(28,8)"), 4)
          .cast("double").as("nmi"),
        $"h_lang", $"h_source", $"h_joint", $"n_cells", lit(n).as("n_docs"))
    // one-row result: materialize and release the persisted cell census
    val rows0 = java.util.Arrays.asList(out.collect(): _*)
    cells.unpersist(blocking = false)
    s.createDataFrame(rows0, out.schema)
  }

  val miLangSourceOracle: String =
    """WITH cells AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, sum(o) AS rn FROM cells GROUP BY 1),
      |c AS (SELECT source, sum(o) AS cn FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS DOUBLE) AS n, CAST(sum(o) AS BIGINT) AS nl FROM cells),
      |g AS (SELECT cells.o, r.rn, c.cn
      |      FROM cells JOIN r ON cells.lang = r.lang
      |                 JOIN c ON cells.source = c.source),
      |joint AS (
      |  SELECT CAST(round(sum(CAST((o / n) * ln((o / n) / ((rn / n) * (cn / n)))
      |                          AS DECIMAL(28,8))), 6) AS DOUBLE) AS mi,
      |         CAST(round(-sum(CAST((o / n) * ln(o / n) AS DECIMAL(28,8))), 6)
      |              AS DOUBLE) AS h_joint,
      |         count(*) AS n_cells, any_value(nl) AS n_docs
      |  FROM g CROSS JOIN t),
      |hx AS (SELECT CAST(round(-sum(CAST((rn / n) * ln(rn / n) AS DECIMAL(28,8))), 6)
      |              AS DOUBLE) AS h_lang FROM r CROSS JOIN t),
      |hy AS (SELECT CAST(round(-sum(CAST((cn / n) * ln(cn / n) AS DECIMAL(28,8))), 6)
      |              AS DOUBLE) AS h_source FROM c CROSS JOIN t)
      |SELECT mi,
      |       CAST(round(CAST(mi / sqrt(h_lang * h_source) AS DECIMAL(28,8)), 4)
      |            AS DOUBLE) AS nmi,
      |       h_lang, h_source, h_joint,
      |       CAST(n_cells AS BIGINT) AS n_cells, CAST(n_docs AS BIGINT) AS n_docs
      |FROM joint, hx, hy""".stripMargin

  /** Per-type drift HEALTH REPORT between two time windows (ref = week 1,
    * cur = week 2 of the stream) — the one-page readout an ingest
    * pipeline pages on, and the oracle-gated batch twin of the
    * maintained-view composite [[graft.streaming.HealthReport]]: volume
    * mix (per-type share of each window + delta + alert at 5 share
    * points) and value level (exact per-window p50/p99 via
    * `percentile_disc` — an actual order statistic, bit-identical across
    * engines per the [[graft.operators.Audit.robustOutliers]] precedent —
    * with an alert when the median moves ±1.5× between windows).
    *
    * Scale shape: ONE aggregation pass over the filtered scan — both
    * windows' counts and percentiles come from conditional aggregates in
    * the same groupBy(event_type) (percentile over `CASE WHEN win THEN
    * value END` ignores the other window's rows as nulls), so adding the
    * second window costs columns, not a second scan. The ≤|event_type|
    * census rows then materialize on the driver for the share totals
    * (the miOf idiom — joining a 1-row total back would constant-fold to
    * a BNLJ) and the flags derive from the QUANTIZED columns so both
    * engines compare identical doubles. */
  def healthReportBatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val census = Tables.events(s, d)
      .filter($"ts" >= "2024-01-01" && $"ts" < "2024-01-15")
      .select($"event_type", ($"ts" < "2024-01-08").as("is_ref"), $"value")
      .groupBy($"event_type")
      .agg(
        sum(when($"is_ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("n_cur"),
        expr("percentile_disc(0.5) WITHIN GROUP " +
          "(ORDER BY CASE WHEN is_ref THEN value END)").as("p50_ref"),
        expr("percentile_disc(0.5) WITHIN GROUP " +
          "(ORDER BY CASE WHEN NOT is_ref THEN value END)").as("p50_cur"),
        expr("percentile_disc(0.99) WITHIN GROUP " +
          "(ORDER BY CASE WHEN is_ref THEN value END)").as("p99_ref"),
        expr("percentile_disc(0.99) WITHIN GROUP " +
          "(ORDER BY CASE WHEN NOT is_ref THEN value END)").as("p99_cur"))
    val rows = census.collect() // ≤ |event_type| rows, bounded
    val totR = rows.map(_.getAs[Long]("n_ref")).sum
    val totC = rows.map(_.getAs[Long]("n_cur")).sum
    val base = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), census.schema)
    val shaped = base.select(
      $"event_type", $"n_ref", $"n_cur",
      round(($"n_ref".cast("double") / lit(totR.toDouble))
        .cast("decimal(28,8)"), 6).cast("double").as("share_ref"),
      round(($"n_cur".cast("double") / lit(totC.toDouble))
        .cast("decimal(28,8)"), 6).cast("double").as("share_cur"),
      round(($"n_cur".cast("double") / lit(totC.toDouble)
        - $"n_ref".cast("double") / lit(totR.toDouble))
        .cast("decimal(28,8)"), 6).cast("double").as("share_delta"),
      $"p50_ref", $"p50_cur", $"p99_ref", $"p99_cur")
    val out = shaped.select($"*",
      (abs($"share_delta") > 0.05).as("alert_volume"),
      coalesce($"p50_cur" > $"p50_ref" * 1.5 ||
        $"p50_cur" < $"p50_ref" / 1.5, lit(false)).as("alert_value_shift"))
      .orderBy($"event_type")
    // degenerate-window guard, same contract as the two-sample trio: an
    // empty ref or cur window yields zero rows on both engines
    if (totR == 0 || totC == 0) out.limit(0) else out
  }

  val healthReportBatchOracle: String =
    """WITH ev AS (
      |  SELECT event_type, ts < TIMESTAMP '2024-01-08' AS is_ref, value
      |  FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'),
      |c AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |         CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
      |         quantile_disc(CASE WHEN is_ref THEN value END, 0.5) AS p50_ref,
      |         quantile_disc(CASE WHEN NOT is_ref THEN value END, 0.5) AS p50_cur,
      |         quantile_disc(CASE WHEN is_ref THEN value END, 0.99) AS p99_ref,
      |         quantile_disc(CASE WHEN NOT is_ref THEN value END, 0.99) AS p99_cur
      |  FROM ev GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
      |               CAST(sum(n_cur) AS BIGINT) AS tc FROM c),
      |q AS (
      |  SELECT event_type, n_ref, n_cur,
      |         CAST(round(CAST(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE)
      |                    AS DECIMAL(28,8)), 6) AS DOUBLE) AS share_ref,
      |         CAST(round(CAST(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE)
      |                    AS DECIMAL(28,8)), 6) AS DOUBLE) AS share_cur,
      |         CAST(round(CAST(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE)
      |                         - CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE)
      |                    AS DECIMAL(28,8)), 6) AS DOUBLE) AS share_delta,
      |         p50_ref, p50_cur, p99_ref, p99_cur
      |  FROM c CROSS JOIN tot
      |  WHERE tr > 0 AND tc > 0)
      |SELECT event_type, n_ref, n_cur, share_ref, share_cur, share_delta,
      |       p50_ref, p50_cur, p99_ref, p99_cur,
      |       abs(share_delta) > 0.05 AS alert_volume,
      |       coalesce(p50_cur > p50_ref * CAST(1.5 AS DOUBLE)
      |             OR p50_cur < p50_ref / CAST(1.5 AS DOUBLE), false)
      |         AS alert_value_shift
      |FROM q ORDER BY event_type""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("audit_health_report", Some(healthReportBatchOracle), healthReportBatch),
    Q("audit_chi2_lang_source", Some(chi2LangSourceOracle), chi2LangSource),
    Q("audit_mi_lang_source", Some(miLangSourceOracle), miLangSource),
    Q("audit_psi_value_drift", Some(psiValueDriftOracle), psiValueDrift),
    Q("audit_ks_value_drift", Some(ksValueDriftOracle), ksValueDrift),
    Q("audit_mwu_value_drift", Some(mwuValueDriftOracle), mwuValueDrift),
    Q("audit_w1_value_drift", Some(wassersteinValueDriftOracle), wassersteinValueDrift),
    Q("audit_benford_value_digits", Some(benfordValueDigitsOracle), benfordValueDigits))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Linear text-classifier inference — the fastText-shaped quality/toxicity
  * scorer every corpus build runs over 100 TB to gate documents into the
  * training set (the published CCNet / LLaMA / GPT-3 quality-filter
  * stage): hash each token into a weight table, average the weights,
  * threshold the score.
  *
  * The weight table here is hash-derived (w(t) = (h32(t) mod 1000 − 500)
  * / 1000, i.e. a fixed pseudo-random linear head) so the whole scorer is
  * engine-portable and ORACLE-CHECKED — the md5-based hash plays the role
  * the learned embedding matrix plays in production. With learned
  * weights the only change is a broadcast float array indexed by the same
  * hash (the [[graft.functions.CountMinAggregator]] broadcast-lookup
  * pattern); the plan shape below is already the production one.
  *
  * Scale shape: narrow explode → per-token weight is a pure projection →
  * ONE map-side-combinable aggregation keyed on doc_id (the token rows of
  * a document are co-located with it, so partial sums absorb almost all
  * of the explode fan-out before the shuffle). Per-token weights and the
  * per-doc logit are EXACT integers (milli-units), so cross-engine
  * summation order cannot flip anything.
  */
object Classifier {

  /** THE rule scorer's per-token weight in exact milli-units — one
    * definition shared by the explode+groupBy spelling below and the
    * per-row fold [[ruleLogitCol]], so the two can never drift. */
  private[operators] def tokenWeightMilli(t: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long") % 1000 - 500

  /** Per-row rule logit: the same Σ tokenWeightMilli the classifier
    * aggregates via explode+groupBy, folded as a higher-order aggregate
    * so a caller can rate a document WITHOUT a shuffle (exact int64,
    * order-free — round 16, used by the fused agreement-kappa pass). */
  private[operators] def ruleLogitCol(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(split(text, " "), lit(0L), (acc, t) => acc + tokenWeightMilli(t))

  /** Per-document linear score and accept/reject label. */
  def qualityClassifier(s: SparkSession, d: String): DataFrame =
    qualityClassifierOf(Tables.documents(s, d))

  def qualityClassifierOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // widened: the per-token md5 runs in the scan task otherwise
    // (one-row-group input, guide §2.5); downstream integer sums are
    // order-independent
    val tok = graft.Tables.widened(docs)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
    tok
      .select($"doc_id", tokenWeightMilli($"t").as("w_milli"))
      .groupBy($"doc_id")
      .agg(sum($"w_milli").as("sum_milli"), count(lit(1)).as("n_tokens"))
      .select(
        $"doc_id", $"n_tokens",
        // The raw logit stays in EXACT milli-units (a BIGINT): dividing to
        // a per-token mean and rounding lands on half-boundaries whenever
        // n_tokens is a power of two (observed flipping at sf0.01), and
        // the threshold decision only needs the sign anyway.
        $"sum_milli".as("logit_milli"),
        ($"sum_milli" > 0).as("accepted"))
      .orderBy($"doc_id")
  }

  val qualityClassifierOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |w AS (
      |  SELECT doc_id,
      |         (CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1000) - 500 AS w_milli
      |  FROM tok)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(w_milli) AS BIGINT) AS logit_milli,
      |       sum(w_milli) > 0 AS accepted
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Classifier evaluation: reliability bins + ranking AUC
  // -------------------------------------------------------------------

  /** The reference label the classifier is evaluated against: the
    * length-based heuristic quality gate (TextOps.qualityScore's
    * `len_ok`) — an independent signal, standing in for human labels. */
  private def labeled(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    qualityClassifierOf(docs).select($"doc_id", $"logit_milli")
      .join(docs.select($"doc_id", (length($"text") >= 200).as("pos")), "doc_id")
  }

  /** Reliability table: fixed integer logit bins (width 500 milli, clamped
    * to [-6, 5]) × observed positive rate — the calibration readout a
    * filter threshold is tuned from. Bins are pure integer/exact-boundary
    * arithmetic (never a transcendental squashing first), so bin
    * membership can't flip between engines. One narrow scan + one tiny
    * aggregation; the bin table is |bins|-bounded. The TRAINED model's
    * probability-scale companion (mean predicted vs empirical rate +
    * ECE) is [[LrTrain.lrCalibration]] (`quality_lr_calibration`). */
  def qualityCalibration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    labeled(Tables.documents(s, d))
      .withColumn("bin",
        greatest(lit(-6L), least(lit(5L), floor($"logit_milli" / lit(500.0)))))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        sum(when($"pos", 1L).otherwise(0L)).as("n_pos"),
        sum($"logit_milli").as("sum_logit"))
      .select($"bin", $"n", $"n_pos",
        round($"n_pos".cast("double") / $"n", 4).as("pos_rate"),
        round($"sum_logit".cast("double") / $"n", 4).as("mean_logit"))
      .orderBy($"bin")
  }

  val qualityCalibrationOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |w AS (
      |  SELECT doc_id,
      |         (CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1000) - 500 AS w_milli
      |  FROM tok),
      |sc AS (SELECT doc_id, sum(w_milli) AS logit FROM w GROUP BY doc_id),
      |lab AS (SELECT sc.doc_id, sc.logit, length(d.text) >= 200 AS pos
      |        FROM sc JOIN documents d USING (doc_id)),
      |b AS (SELECT greatest(-6, least(5, CAST(floor(logit / 500.0) AS BIGINT))) AS bin,
      |             logit, pos
      |      FROM lab)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |       CAST(round(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
      |             / count(*), 4) AS DOUBLE) AS pos_rate,
      |       CAST(round(CAST(sum(logit) AS DOUBLE) / count(*), 4) AS DOUBLE) AS mean_logit
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  /** Ranking quality as Mann–Whitney AUC of the logit against the label,
    * tie-aware and EXACT: with [[RankStats.withRankCounts]]'s strictly-
    * smaller (`__lt`) and smaller-or-equal (`__le`) counts, a row's
    * doubled average rank is `__lt + __le + 1`, so 2U = Σ₊(…) − nₚ(nₚ+1)
    * is an integer and AUC = 2U / (2·nₚ·nₙ) is one exact division — no
    * per-pair comparison (the naive O(n²)) and, via RankStats' range-
    * bucketed ranks, NO single-partition global sort at 100 TB. */
  def qualityAuc(s: SparkSession, d: String): DataFrame =
    qualityAucOf(labeled(Tables.documents(s, d)))

  /** AUC over any (logit_milli, pos) relation (spec entry point). */
  private[operators] def qualityAucOf(lab: DataFrame): DataFrame = {
    val s = lab.sparkSession
    import s.implicits._
    val rk = RankStats.withRankCounts(lab, "logit_milli")
    rk.agg(
        sum(when($"pos", $"__lt" + $"__le" + 1L).otherwise(0L)).as("s2r"),
        sum(when($"pos", 1L).otherwise(0L)).as("n_pos"),
        sum(when(!$"pos", 1L).otherwise(0L)).as("n_neg"))
      .select($"n_pos", $"n_neg",
        round(($"s2r" - $"n_pos" * ($"n_pos" + 1L)).cast("double") /
          (lit(2.0) * $"n_pos" * $"n_neg"), 6).as("auc"))
  }

  val qualityAucOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |w AS (
      |  SELECT doc_id,
      |         (CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1000) - 500 AS w_milli
      |  FROM tok),
      |sc AS (SELECT doc_id, sum(w_milli) AS logit FROM w GROUP BY doc_id),
      |lab AS (SELECT sc.doc_id, sc.logit, length(d.text) >= 200 AS pos
      |        FROM sc JOIN documents d USING (doc_id)),
      |rk AS (SELECT pos,
      |              rank() OVER (ORDER BY logit) - 1 AS lt,
      |              count(*) OVER (ORDER BY logit RANGE BETWEEN UNBOUNDED
      |                             PRECEDING AND CURRENT ROW) AS le
      |       FROM lab)
      |SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |       CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
      |       CAST(round(CAST(sum(CASE WHEN pos THEN lt + le + 1 ELSE 0 END)
      |               - sum(CASE WHEN pos THEN 1 ELSE 0 END)
      |                 * (sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1) AS DOUBLE)
      |             / (2.0 * sum(CASE WHEN pos THEN 1 ELSE 0 END)
      |                * sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)), 6) AS DOUBLE) AS auc
      |FROM rk""".stripMargin

  /** Precision–recall curve — [[qualityAuc]]'s other readout (round-8
    * verdict #7): one row per candidate threshold (the 250-milli logit
    * bin boundaries, clamped to [−4000, 4000]; the bottom bin is
    * unbounded below, so its row is the all-docs operating point), with
    * exact integer predicted/true-positive counts and the
    * precision/recall/F1 a filter threshold is actually chosen from.
    *
    * Scale shape: ONE narrow scan aggregates (n, n_pos) per bin; the
    * cumulation from the top runs on the driver over the ≤33-row bin
    * table — the A7 collect-to-driver report pattern (a cumulative
    * window here would be exactly the unpartitioned-window shape
    * PlanHygieneSpec bans; bounded-by-construction driver arithmetic is
    * the honest alternative). All counts integer, ratios rounded at 4 dp
    * from identical integers on both engines. */
  def qualityPrCurve(s: SparkSession, d: String): DataFrame =
    prCurveOf(labeled(Tables.documents(s, d)))

  /** The curve over any (logit_milli, pos) relation (spec entry point). */
  private[operators] def prCurveOf(lab: DataFrame): DataFrame = {
    val s = lab.sparkSession
    import s.implicits._
    val bins = lab
      .withColumn("bin",
        greatest(lit(-16L), least(lit(16L), floor($"logit_milli" / lit(250.0)))))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum(when($"pos", 1L).otherwise(0L)).as("np"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1) // cumulate from the highest threshold down
    val totalPos = bins.map(_._3).sum
    require(totalPos > 0, "PR curve needs at least one positive")
    var cn = 0L
    var cp = 0L
    // HALF_UP at 4 dp — the rounding rule DuckDB's round() applies to the
    // identical double, so ties can't split across engines
    def r4(v: Double): Double =
      BigDecimal(v).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = bins.map { case (bin, n, np) =>
      cn += n; cp += np
      val p = cp.toDouble / cn
      val r = cp.toDouble / totalPos
      val f1 = if (cp == 0) 0.0 else 2.0 * p * r / (p + r)
      (bin * 250L, cn, cp, r4(p), r4(r), r4(f1))
    }
    rows.reverse.toSeq
      .toDF("thr_milli", "n_pred", "tp", "precision", "recall", "f1")
      .orderBy($"thr_milli")
  }

  /** Fully independent oracle: same tokenization/logit recompute as the
    * calibration oracle, cumulated with a window (fine on the ORACLE
    * side — DuckDB has no 100 TB plan contract to honor). */
  val qualityPrCurveOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |w AS (
      |  SELECT doc_id,
      |         (CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1000) - 500 AS w_milli
      |  FROM tok),
      |sc AS (SELECT doc_id, sum(w_milli) AS logit FROM w GROUP BY doc_id),
      |lab AS (SELECT sc.doc_id, sc.logit, length(d.text) >= 200 AS pos
      |        FROM sc JOIN documents d USING (doc_id)),
      |b AS (SELECT greatest(-16, least(16, CAST(floor(logit / 250.0) AS BIGINT))) AS bin,
      |             count(*) AS n,
      |             sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np
      |      FROM lab GROUP BY 1),
      |c AS (SELECT bin,
      |             sum(n)  OVER (ORDER BY bin DESC
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
      |             sum(np) OVER (ORDER BY bin DESC
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
      |             sum(np) OVER () AS total_pos
      |      FROM b)
      |SELECT bin * 250 AS thr_milli,
      |       CAST(cn AS BIGINT) AS n_pred, CAST(cp AS BIGINT) AS tp,
      |       CAST(round(CAST(cp AS DOUBLE) / cn, 4) AS DOUBLE) AS precision,
      |       CAST(round(CAST(cp AS DOUBLE) / total_pos, 4) AS DOUBLE) AS recall,
      |       CAST(CASE WHEN cp = 0 THEN 0.0
      |            ELSE round(2.0 * (CAST(cp AS DOUBLE) / cn) * (CAST(cp AS DOUBLE) / total_pos)
      |                       / (CAST(cp AS DOUBLE) / cn + CAST(cp AS DOUBLE) / total_pos), 4)
      |            END AS DOUBLE) AS f1
      |FROM c ORDER BY thr_milli""".stripMargin

  /** Split-conformal quality threshold — the distribution-free way to
    * turn ANY quality score into a filter with a coverage GUARANTEE
    * (Vovk et al.; Papadopoulos et al. 2002 split form): take a
    * calibration half (deterministic md5 split, the sampling family's
    * draw), compute each doc's nonconformity, and set the cutoff at the
    * ⌈(n+1)(1−α)⌉-th smallest calibration nonconformity — then ANY
    * exchangeable new doc lands under the cutoff with probability
    * ≥ 1−α, no model assumptions. This is how a curation pipeline sets
    * "keep the most natural 90%" with a certificate instead of an
    * eyeballed threshold.
    *
    * Nonconformity here = −(stopword micro ratio): fewer stopwords reads
    * as less natural English. Everything is exact integer (micro ratio,
    * ceil via integer arithmetic, ties-inclusive cumulative selection),
    * so both engines agree bit-for-bit. The order statistic is selected
    * WITHOUT a global sort: the RankStats bucket shape — range buckets
    * from approxQuantile, per-bucket counts → ≤buckets-row driver
    * offsets, per-bucket ties-inclusive cumulative, min(value | cum ≥ k).
    * The empirical holdout coverage rides along as a micro int (its
    * EXPECTATION is ≥ 1−α; single-split realizations wobble —
    * ConformalSpec checks the guarantee statistically on a planted
    * corpus and the selection exactly). */
  def conformalThreshold(s: SparkSession, d: String,
      alphaPct: Int = 10): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // the micro ratio divides NONNEGATIVE integers and negates AFTER the
    // div — a negative numerator would floor/trunc-diverge across engines
    val pos = Tables.documents(s, d)
      .select($"doc_id",
        (substring(md5($"doc_id".cast("string")), 1, 1) < "8").as("is_cal"),
        (-expr("(10000 * size(filter(split(text, ' '), t -> t IN ('the','a')))) div size(split(text, ' '))"))
          .as("nonconf"))
    val cal = pos.filter($"is_cal")
    val nCal = cal.count()
    // ceil((1-alpha)(n+1)) in exact integer arithmetic
    val k = ((100L - alphaPct) * (nCal + 1) + 99L) / 100L
    val bounds = RankStats.rangeBounds(
      cal.select($"nonconf".cast("double").as("v")), "v", RankStats.DefaultBuckets)
    val bucketed = cal.withColumn("__bucket",
      RankStats.bucketOf($"nonconf".cast("double"), bounds))
    val offs = bucketed.groupBy($"__bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offDf = s.createDataFrame(
      offs.map(_._1).zip(offs.scanLeft(0L)(_ + _._2).init).toSeq)
      .toDF("__bucket", "__off")
    require(k <= nCal, s"conformal index k=$k exceeds the calibration " +
      s"size $nCal — the corpus is too small for alpha=$alphaPct%: the " +
      "threshold is +infinity (keep everything); fail loudly rather than " +
      "return an engine-dependent null")
    val w = Window.partitionBy($"__bucket").orderBy($"nonconf")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // one-row driver materialization (bounded by construction) — joining
    // the scalar back would constant-fold to the BroadcastNestedLoopJoin
    // shape the hygiene gate rejects
    val threshold = bucketed.join(broadcast(offDf), Seq("__bucket"))
      .withColumn("cum", $"__off" + count(lit(1)).over(w))
      .agg(min(when($"cum" >= k, $"nonconf")).as("threshold"))
      .head().getLong(0)
    pos.filter(!$"is_cal")
      .agg(count(lit(1)).as("n_test"),
        sum(when($"nonconf" <= threshold, 1L).otherwise(0L)).as("n_covered"))
      .select(lit(nCal).as("n_cal"), lit(k).as("k"),
        lit(threshold).as("threshold"), $"n_test",
        expr("(10000 * n_covered) div n_test").as("coverage_e4"))
  }

  val conformalThresholdOracle: String =
    """WITH scored AS (
      |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_cal,
      |         -((10000 * len(list_filter(string_split(text, ' '),
      |             t -> t IN ('the','a')))) // len(string_split(text, ' ')))
      |           AS nonconf
      |  FROM documents),
      |cal AS (SELECT nonconf FROM scored WHERE is_cal),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_cal,
      |             (9 * (count(*) + 1) + 9) // 10 AS k FROM cal),
      |cum AS (SELECT nonconf,
      |               count(*) OVER (ORDER BY nonconf
      |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |        FROM cal),
      |thr AS (SELECT min(CASE WHEN cum.cum >= n.k THEN cum.nonconf END)
      |          AS threshold
      |        FROM cum CROSS JOIN n),
      |test AS (SELECT nonconf FROM scored WHERE NOT is_cal)
      |SELECT n.n_cal, CAST(n.k AS BIGINT) AS k,
      |       CAST(thr.threshold AS BIGINT) AS threshold,
      |       CAST(count(*) AS BIGINT) AS n_test,
      |       CAST((10000 * sum(CASE WHEN test.nonconf <= thr.threshold
      |                         THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
      |         AS coverage_e4
      |FROM test CROSS JOIN thr CROSS JOIN n
      |GROUP BY n.n_cal, n.k, thr.threshold""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("quality_conformal_threshold", Some(conformalThresholdOracle),
      (s, d) => conformalThreshold(s, d)),
    Q("text_quality_classifier", Some(qualityClassifierOracle), qualityClassifier),
    Q("quality_calibration", Some(qualityCalibrationOracle), qualityCalibration),
    Q("quality_auc", Some(qualityAucOracle), qualityAuc),
    Q("quality_pr_curve", Some(qualityPrCurveOracle), qualityPrCurve))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-space health audit — the one-row readout a training-data
  * pipeline checks before trusting ANY downstream similarity machinery
  * (kNN, SemDeDup, clustering): a collapsed or anisotropic embedding
  * space silently degrades every cosine-based decision made on top of
  * it.
  *
  * Reported: vector/dimension counts, the second moment E[‖v‖²], the
  * squared norm of the mean vector ‖μ‖², their ratio — a standard
  * anisotropy score: 0 for a perfectly centered cloud, →1 as vectors
  * collapse onto one direction (Ethayarajh, EMNLP 2019 measures the
  * same phenomenon via average pairwise cosine; E[cos(u,v)] ≈
  * ‖μ‖²/E[‖v‖²] for normalized vectors) — and the min/max per-vector
  * squared norms (zero or exploding rows are ingest bugs).
  *
  * Scale shape: two scans of the flattened (row, dim, x) relation, each
  * collapsing immediately into a map-side-combinable hash aggregate —
  * one keyed by dim (grid ≤ d rows), one keyed by vec_id (the per-row
  * norms). No joins against the data, no windows; the d-row grid and
  * three one-row aggregates assemble via broadcast on a constant key.
  *
  * Cross-engine determinism: every float32 coordinate is exact in
  * double and x·x is exact (24-bit mantissas: the product fits in 48
  * bits); each term is quantized to DECIMAL(28,8) and summed in exact
  * decimal, so no readout depends on summation order. Derived doubles
  * (÷n, squares, the isotropy ratio) use identical operation order on
  * both engines over identical inputs — correctly-rounded IEEE ops —
  * then round through the decimal idiom. */
object EmbeddingAudit {

  def embeddingHealth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def flat = Tables.embeddings(s, d)
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", $"pos".as("dim"), $"col".cast("double").as("x"))
    val perDim = flat.groupBy($"dim")
      .agg(sum($"x".cast("decimal(28,8)")).as("sx"),
        sum(($"x" * $"x").cast("decimal(28,8)")).as("sxx"),
        count(lit(1)).as("cnt"))
      .persist()
    val n = perDim.agg(max($"cnt")).head().getLong(0)
    val nD = n.toDouble
    val dimAgg = perDim.agg(
      count(lit(1)).as("n_dims"),
      (sum($"sxx").cast("double") / lit(nD)).as("mean_sq_norm_raw"))
      .withColumn("k", lit(1))
    val muAgg = perDim
      .select((($"sx".cast("double") / lit(nD)) * ($"sx".cast("double") / lit(nD)))
        .cast("decimal(28,8)").as("t"))
      .agg(sum($"t").cast("double").as("mu_sq_norm_raw"))
      .withColumn("k", lit(1))
    val rowAgg = flat.groupBy($"vec_id")
      .agg(sum(($"x" * $"x").cast("decimal(28,8)")).as("nsq"))
      .agg(count(lit(1)).as("n_vectors"),
        min($"nsq").cast("double").as("min_sq_norm_raw"),
        max($"nsq").cast("double").as("max_sq_norm_raw"))
      .withColumn("k", lit(1))
    val out = rowAgg
      .join(broadcast(dimAgg), Seq("k"))
      .join(broadcast(muAgg), Seq("k"))
      .select($"n_vectors", $"n_dims",
        round($"mean_sq_norm_raw".cast("decimal(28,8)"), 4)
          .cast("double").as("mean_sq_norm"),
        round($"mu_sq_norm_raw".cast("decimal(28,8)"), 6)
          .cast("double").as("mu_sq_norm"),
        round(($"mu_sq_norm_raw" / $"mean_sq_norm_raw").cast("decimal(28,8)"), 6)
          .cast("double").as("isotropy"),
        round($"min_sq_norm_raw".cast("decimal(28,8)"), 4)
          .cast("double").as("min_sq_norm"),
        round($"max_sq_norm_raw".cast("decimal(28,8)"), 4)
          .cast("double").as("max_sq_norm"))
    // one-row result: materialize and release the persisted dim grid
    val rows0 = java.util.Arrays.asList(out.collect(): _*)
    perDim.unpersist(blocking = false)
    s.createDataFrame(rows0, out.schema)
  }

  val embeddingHealthOracle: String =
    """WITH flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |per_dim AS (
      |  SELECT dim, sum(CAST(x AS DECIMAL(28,8))) AS sx,
      |         sum(CAST(x * x AS DECIMAL(28,8))) AS sxx,
      |         count(*) AS cnt
      |  FROM flat GROUP BY dim),
      |nrows AS (SELECT CAST(max(cnt) AS DOUBLE) AS n FROM per_dim),
      |dim_agg AS (
      |  SELECT count(*) AS n_dims,
      |         CAST(sum(sxx) AS DOUBLE) / n AS mean_sq_norm_raw
      |  FROM per_dim CROSS JOIN nrows GROUP BY n),
      |mu_agg AS (
      |  SELECT CAST(sum(CAST((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
      |                       AS DECIMAL(28,8))) AS DOUBLE) AS mu_sq_norm_raw
      |  FROM per_dim CROSS JOIN nrows GROUP BY n),
      |row_agg AS (
      |  SELECT count(*) AS n_vectors,
      |         CAST(min(nsq) AS DOUBLE) AS min_sq_norm_raw,
      |         CAST(max(nsq) AS DOUBLE) AS max_sq_norm_raw
      |  FROM (SELECT vec_id, sum(CAST(x * x AS DECIMAL(28,8))) AS nsq
      |        FROM flat GROUP BY vec_id) r)
      |SELECT CAST(n_vectors AS BIGINT) AS n_vectors,
      |       CAST(n_dims AS BIGINT) AS n_dims,
      |       CAST(round(CAST(mean_sq_norm_raw AS DECIMAL(28,8)), 4) AS DOUBLE)
      |         AS mean_sq_norm,
      |       CAST(round(CAST(mu_sq_norm_raw AS DECIMAL(28,8)), 6) AS DOUBLE)
      |         AS mu_sq_norm,
      |       CAST(round(CAST(mu_sq_norm_raw / mean_sq_norm_raw AS DECIMAL(28,8)), 6)
      |         AS DOUBLE) AS isotropy,
      |       CAST(round(CAST(min_sq_norm_raw AS DECIMAL(28,8)), 4) AS DOUBLE)
      |         AS min_sq_norm,
      |       CAST(round(CAST(max_sq_norm_raw AS DECIMAL(28,8)), 4) AS DOUBLE)
      |         AS max_sq_norm
      |FROM row_agg CROSS JOIN dim_agg CROSS JOIN mu_agg""".stripMargin

  /** Label-conditional separation of the embedding space — the scatter
    * decomposition behind Fisher's discriminant / one-way ANOVA, run on
    * the labeled vectors: total scatter Σ‖v−μ‖² splits exactly into
    * BETWEEN-class Σ_L n_L‖μ_L−μ‖² and WITHIN-class Σ_L Σ_{v∈L}‖v−μ_L‖².
    * The ratio B/W (and η² = B/T) is the one-number answer to "do these
    * labels actually structure the space?" — the go/no-go before
    * trusting label-stratified sampling, per-label centroids
    * ([[Similarity]] sim_label_centroid) or a classifier trained on
    * these embeddings. Random labels ⇒ η² ≈ (L−1)/n; anything not ≫
    * that is noise.
    *
    * Scale shape: ONE pass to the (label × dim) moment grid (hash agg,
    * map-side combinable, ≤ L·d cells ≈ KBs regardless of corpus size);
    * global per-dim moments derive from the grid by summing over
    * labels, never a rescan. All readouts assemble on the bounded grid.
    * Determinism: the [[embeddingHealth]] idiom — exact decimal sums of
    * quantized per-cell double terms in identical op order. */
  def embeddingSeparation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flat = Tables.embeddings(s, d)
      .select($"label", posexplode($"embedding"))
      .select($"label".cast("long").as("label"), $"pos".as("dim"),
        $"col".cast("double").as("x"))
    val cells = flat.groupBy($"label", $"dim")
      .agg(sum($"x".cast("decimal(28,8)")).as("sx"),
        sum(($"x" * $"x").cast("decimal(28,8)")).as("sxx"),
        count(lit(1)).as("cnt"))
      .persist()
    val gdim2 = cells.groupBy($"dim")
      .agg(sum($"sx").as("gx"), sum($"sxx").as("sxx_g"), sum($"cnt").as("n"))
    val n = gdim2.agg(max($"n")).head().getLong(0)
    val nD = n.toDouble
    // global ||mu||^2 and total sum of squares from the dim grid
    val muD = $"gx".cast("double") / lit(nD)
    val glob = gdim2.agg(
      sum((muD * muD).cast("decimal(28,8)")).cast("double").as("mu_sq"),
      sum($"sxx_g").cast("double").as("ssq"))
      .withColumn("k", lit(1))
    // per-label readouts against the broadcast global per-dim means
    val withMu = cells.join(
      broadcast(gdim2.select($"dim", ($"gx".cast("double") / lit(nD)).as("mu_d"))),
      Seq("dim"))
    val muLd = $"sx".cast("double") / $"cnt".cast("double")
    val perLabel = withMu.groupBy($"label")
      .agg(max($"cnt").as("n_vecs"),
        sum($"sxx").as("ssq_l"),
        sum(($"cnt".cast("double") * ((muLd - $"mu_d") * (muLd - $"mu_d")))
          .cast("decimal(28,8)")).as("b_l"),
        sum((muLd * muLd).cast("decimal(28,8)")).cast("double").as("musq_l"))
    val withinL = ($"ssq_l".cast("double") - $"n_vecs".cast("double") * $"musq_l")
      .cast("decimal(28,8)")
    val agg = perLabel.agg(
      count(lit(1)).as("n_labels"),
      sum($"b_l").cast("double").as("between_raw"),
      sum(withinL).cast("double").as("within_raw"))
      .withColumn("k", lit(1))
    val out = agg.join(broadcast(glob), Seq("k"))
      .select($"n_labels", lit(n).as("n_vectors"),
        round($"between_raw".cast("decimal(28,8)"), 4).cast("double").as("between_ss"),
        round($"within_raw".cast("decimal(28,8)"), 4).cast("double").as("within_ss"),
        round(($"ssq" - lit(nD) * $"mu_sq").cast("decimal(28,8)"), 4)
          .cast("double").as("total_ss"),
        round(($"between_raw" / $"within_raw").cast("decimal(28,8)"), 6)
          .cast("double").as("fisher_ratio"),
        round(($"between_raw" / ($"ssq" - lit(nD) * $"mu_sq"))
          .cast("decimal(28,8)"), 6).cast("double").as("eta_sq"))
    val rows0 = java.util.Arrays.asList(out.collect(): _*)
    cells.unpersist(blocking = false)
    s.createDataFrame(rows0, out.schema)
  }

  val embeddingSeparationOracle: String =
    """WITH flat AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |         generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |cells AS (
      |  SELECT label, dim, sum(CAST(x AS DECIMAL(28,8))) AS sx,
      |         sum(CAST(x * x AS DECIMAL(28,8))) AS sxx,
      |         count(*) AS cnt
      |  FROM flat GROUP BY label, dim),
      |gdim AS (
      |  SELECT dim, sum(sx) AS gx, sum(sxx) AS sxx_g, sum(cnt) AS n_g
      |  FROM cells GROUP BY dim),
      |nn AS (SELECT CAST(max(n_g) AS DOUBLE) AS n FROM gdim),
      |gtot AS (
      |  SELECT CAST(sum(CAST((CAST(gx AS DOUBLE) / n) * (CAST(gx AS DOUBLE) / n)
      |                       AS DECIMAL(28,8))) AS DOUBLE) AS mu_sq,
      |         CAST(sum(sxx_g) AS DOUBLE) AS ssq
      |  FROM gdim CROSS JOIN nn GROUP BY n),
      |per_label AS (
      |  SELECT label, max(cnt) AS n_vecs, sum(sxx) AS ssq_l,
      |         sum(CAST(CAST(cnt AS DOUBLE)
      |                  * ((CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE)
      |                      - CAST(gx AS DOUBLE) / n)
      |                     * (CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE)
      |                        - CAST(gx AS DOUBLE) / n))
      |             AS DECIMAL(28,8))) AS b_l,
      |         CAST(sum(CAST((CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE))
      |                       * (CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE))
      |                  AS DECIMAL(28,8))) AS DOUBLE) AS musq_l
      |  FROM cells JOIN gdim USING (dim) CROSS JOIN nn
      |  GROUP BY label),
      |agg AS (
      |  SELECT count(*) AS n_labels,
      |         CAST(sum(b_l) AS DOUBLE) AS between_raw,
      |         CAST(sum(CAST(CAST(ssq_l AS DOUBLE)
      |                       - CAST(n_vecs AS DOUBLE) * musq_l
      |                  AS DECIMAL(28,8))) AS DOUBLE) AS within_raw
      |  FROM per_label)
      |SELECT CAST(n_labels AS BIGINT) AS n_labels,
      |       CAST(n AS BIGINT) AS n_vectors,
      |       CAST(round(CAST(between_raw AS DECIMAL(28,8)), 4) AS DOUBLE) AS between_ss,
      |       CAST(round(CAST(within_raw AS DECIMAL(28,8)), 4) AS DOUBLE) AS within_ss,
      |       CAST(round(CAST(ssq - n * mu_sq AS DECIMAL(28,8)), 4) AS DOUBLE) AS total_ss,
      |       CAST(round(CAST(between_raw / within_raw AS DECIMAL(28,8)), 6) AS DOUBLE)
      |         AS fisher_ratio,
      |       CAST(round(CAST(between_raw / (ssq - n * mu_sq) AS DECIMAL(28,8)), 6)
      |         AS DOUBLE) AS eta_sq
      |FROM agg CROSS JOIN gtot CROSS JOIN nn""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("audit_embedding_health", Some(embeddingHealthOracle), embeddingHealth),
    Q("audit_embedding_separation", Some(embeddingSeparationOracle), embeddingSeparation))
}

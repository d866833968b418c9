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

  val defs: Seq[Q] = Seq(
    Q("audit_embedding_health", Some(embeddingHealthOracle), embeddingHealth))
}

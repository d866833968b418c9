package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed Lloyd's k-means over the embedding corpus — the clustering
  * primitive behind corpus curation (topic balancing, SemDeDup's cells,
  * IVF coarse quantizers): K=10 centroids, 5 full Lloyd iterations,
  * deterministic init (the K smallest vec_ids). Complements
  * [[Similarity.kmeansProfile]] (cosine cells, golden-pinned because
  * float Lloyd state isn't SQL-replayable): this variant is built to be
  * FULLY oracle-verifiable, trading float centroids for the lattice.
  *
  * The whole algorithm runs on a power-of-two integer lattice: float32
  * coordinates are quantized ONCE via floor(x·4096 + 0.5) — ×4096 is an
  * EXACT IEEE scaling of a float32-in-double, so the quantization itself
  * is bit-exact cross-engine, not approximately so — and from there every
  * distance (Σ(x−c)², ≤2^30 for 64 dims of ≤2^12 values), argmin
  * (first-minimum tie-break), and centroid update (integer mean, both
  * engines truncating toward zero) is exact int64 arithmetic. The DuckDB
  * oracle replays all 5 iterations from the parquet alone and must land
  * on the identical assignment table bit-for-bit.
  *
  * Scale shape: the quantized corpus is cached once (localCheckpoint);
  * each iteration is (a) a narrow argmin projection against the K×64
  * centroid table embedded as literals (no join — centroids are model
  * state, broadcast by value exactly like [[LrTrain]]'s weights), and
  * (b) ONE map-side-combinable (cluster, dim) aggregate whose key space
  * is K·dim = 640 — driver traffic is 640 longs per iteration. This is
  * the canonical k-means-on-Spark shape (MLlib does the same with f32
  * axpy instead of exact lattice sums).
  */
object Kmeans {

  val K = 10
  val Iters = 5
  val Dim = 64

  /** Quantized corpus: (vec_id, label, e: array<long> of 64). */
  private[operators] def quantized(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select($"vec_id", $"label",
      transform($"embedding", x =>
        floor(x.cast("double") * 4096d + 0.5d).cast("long")).as("e"))
  }

  /** Squared integer distances of column `e` to every centroid, as one
    * array column from ONE 2D-array literal. The earlier shape built K
    * separate typedlit(centroid) literals per iteration, so catalyst
    * re-analyzed and re-codegen'd a K·dim-literal tree every Lloyd step
    * (the Similarity.kmeansCentroids lesson — pure driver overhead);
    * this tree is value-independent, so the codegen cache holds across
    * iterations. Same exact int64 arithmetic in the same order. */
  private def distsTo(cents: Seq[Seq[Long]]): Column =
    transform(typedlit(cents), c =>
      aggregate(zip_with(col("e"), c, (x, cc) => (x - cc) * (x - cc)),
        lit(0L), (a, x) => a + x))

  /** Cluster of `e` under the given centroids: first argmin (ties break
    * toward the smaller cluster id). */
  private def clusterOf(cents: Seq[Seq[Long]]): Column = {
    val dists = distsTo(cents)
    (array_position(dists, array_min(dists)) - 1L).cast("int")
  }

  /** Lloyd training; returns final centroids. Memoized per (session, dir). */
  private[operators] def train(s: SparkSession, d: String): Seq[Seq[Long]] =
    SessionCaches.modelMemo(s, s"kmeans:$d") {
      trainOf(Tables.embeddings(s, d))
    }

  private[operators] def trainOf(embs: DataFrame): Seq[Seq[Long]] = {
      val s = embs.sparkSession
      import s.implicits._
      val q = quantized(embs)
        .select($"vec_id", $"e").localCheckpoint()
      var cents: Seq[Seq[Long]] = q.where($"vec_id" < K)
        .orderBy($"vec_id").as[(Long, Seq[Long])].collect().map(_._2).toSeq
      for (_ <- 0 until Iters) {
        val assigned = q.withColumn("cluster", clusterOf(cents))
        val sums = assigned
          .select($"cluster", posexplode($"e").as(Seq("i", "x")))
          .groupBy($"cluster", $"i")
          .agg(sum($"x").as("sx"), count(lit(1)).as("c"))
          .collect()
          .groupBy(_.getInt(0))
        // integer mean per dim; empty clusters keep their previous centroid
        cents = (0 until K).map { j =>
          sums.get(j) match {
            case Some(rows) =>
              val byDim = rows.map(r => r.getInt(1) -> (r.getLong(2) / r.getLong(3))).toMap
              (0 until Dim).map(i => byDim(i))
            case None => cents(j)
          }
        }
      }
      cents
    }

  /** Final hard assignment: (vec_id, cluster, dist). */
  def kmeansAssign(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = train(s, d)
    quantized(Tables.embeddings(s, d))
      .select($"vec_id", clusterOf(cents).as("cluster"),
        array_min(distsTo(cents)).as("dist"))
      .orderBy($"vec_id")
  }

  /** Cluster quality against the held-out generator labels: majority
    * label and purity per cluster (the external-validation readout). */
  def kmeansPurity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cents = train(s, d)
    val lab = quantized(Tables.embeddings(s, d))
      .select($"vec_id", $"label", clusterOf(cents).as("cluster"))
    val cnt = lab.groupBy($"cluster", $"label").agg(count(lit(1)).as("c"))
    val win = Window.partitionBy($"cluster").orderBy($"c".desc, $"label")
    cnt
      .withColumn("rk", row_number().over(win))
      .withColumn("n", sum($"c").over(Window.partitionBy($"cluster")))
      .where($"rk" === 1)
      .select($"cluster", $"n".cast("long").as("n"),
        $"label".cast("long").as("maj_label"), $"c".as("n_maj"),
        expr("(1000 * c) div n").as("purity_milli"))
      .orderBy($"cluster")
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle: the full 5-iteration Lloyd replay, generated.
  // ---------------------------------------------------------------------

  private def chainSql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH qemb AS MATERIALIZED (
              |  SELECT vec_id, label,
              |         list_transform(embedding,
              |           x -> CAST(floor(CAST(x AS DOUBLE) * 4096 + 0.5) AS BIGINT)) AS e
              |  FROM embeddings),
              |cent0 AS (SELECT vec_id AS j, e AS ce FROM qemb WHERE vec_id < $K),
              |""".stripMargin
    for (t <- 1 to Iters) {
      val p = t - 1
      sb ++= s"""asg$t AS MATERIALIZED (
                |  SELECT vec_id, j AS cluster FROM (
                |    SELECT q.vec_id, c.j,
                |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
                |             list_sum(list_transform(generate_series(1, $Dim),
                |               i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))), c.j) AS rk
                |    FROM qemb q CROSS JOIN cent$p c)
                |  WHERE rk = 1),
                |new$t AS (
                |  SELECT cluster AS j, list(v ORDER BY i) AS ce FROM (
                |    SELECT a.cluster, u.i,
                |           ${SqlIdioms.tdivSql("CAST(sum(q.e[u.i]) AS BIGINT)", "CAST(count(*) AS BIGINT)")} AS v
                |    FROM asg$t a JOIN qemb q USING (vec_id),
                |         UNNEST(generate_series(1, $Dim)) AS u(i)
                |    GROUP BY a.cluster, u.i)
                |  GROUP BY cluster),
                |cent$t AS (
                |  SELECT p.j, COALESCE(n.ce, p.ce) AS ce
                |  FROM cent$p p LEFT JOIN new$t n USING (j)),
                |""".stripMargin
    }
    sb.toString
  }

  val kmeansAssignOracle: String =
    chainSql +
      s"""fin AS (
         |  SELECT q.vec_id, c.j,
         |         list_sum(list_transform(generate_series(1, $Dim),
         |           i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS dist,
         |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |           list_sum(list_transform(generate_series(1, $Dim),
         |             i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))), c.j) AS rk
         |  FROM qemb q CROSS JOIN cent$Iters c)
         |SELECT vec_id, CAST(j AS INT) AS cluster, CAST(dist AS BIGINT) AS dist
         |FROM fin WHERE rk = 1 ORDER BY vec_id""".stripMargin

  val kmeansPurityOracle: String =
    chainSql +
      s"""fin AS (
         |  SELECT q.vec_id, q.label, c.j,
         |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |           list_sum(list_transform(generate_series(1, $Dim),
         |             i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))), c.j) AS rk
         |  FROM qemb q CROSS JOIN cent$Iters c),
         |cnt AS (
         |  SELECT j AS cluster, label, count(*) AS c
         |  FROM fin WHERE rk = 1 GROUP BY 1, 2),
         |ranked AS (
         |  SELECT cluster, label, c,
         |         row_number() OVER (PARTITION BY cluster ORDER BY c DESC, label) AS rk,
         |         sum(c) OVER (PARTITION BY cluster) AS n
         |  FROM cnt)
         |SELECT CAST(cluster AS INT) AS cluster, CAST(n AS BIGINT) AS n,
         |       CAST(label AS BIGINT) AS maj_label, CAST(c AS BIGINT) AS n_maj,
         |       (1000 * CAST(c AS BIGINT)) // CAST(n AS BIGINT) AS purity_milli
         |FROM ranked WHERE rk = 1 ORDER BY cluster""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("sim_kmeans_assign", Some(kmeansAssignOracle), kmeansAssign),
    Q("sim_kmeans_purity", Some(kmeansPurityOracle), kmeansPurity))
}

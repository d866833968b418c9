package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Ground truth for lattice-exact Lloyd's k-means (the DuckDB oracle
  * replays training independently; these pin first principles).
  */
class KmeansSpec extends SparkSuite {

  test("quantization is the exact power-of-two lattice map") {
    import spark.implicits._
    val vals = Seq(0.0f, 0.25f, -0.1546943634748459f, 0.48561254f)
    val df = Seq((1L, 2, vals)).toDF("vec_id", "label", "embedding")
    val got = Kmeans.quantized(df).select($"e").as[Seq[Long]].head()
    val exp = vals.map(v => math.floor(v.toDouble * 4096d + 0.5d).toLong)
    assert(got === exp)
    // ×4096 of a float32-in-double is exact: 0.25f → exactly 1024
    assert(got(1) === 1024L)
  }

  test("planted tight clusters are recovered exactly") {
    import spark.implicits._
    // 3 well-separated centers in 64-dim space; 30 points each with a tiny
    // deterministic wiggle. K=10 leaves 7 centroids empty-or-split, but
    // every pair of same-center points must land in the same cluster and
    // different centers must never merge (separation >> wiggle).
    val dim = Kmeans.Dim
    val pts = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield {
      val base = Array.fill(dim)(0.0f)
      base(c) = 0.4f
      base((c + 7) % dim) = -0.3f
      base((i * 11) % dim) = base((i * 11) % dim) + (if (i % 2 == 0) 0.004f else -0.004f)
      ((c * 30 + i).toLong, c, base.toSeq)
    }
    val df = pts.toDF("vec_id", "label", "embedding")
    val q = Kmeans.quantized(df).select($"vec_id", $"e").localCheckpoint()
    // run the same Lloyd loop via the public assign path on a temp dir is
    // not possible (train reads Tables.embeddings), so exercise the loop
    // body through train's building blocks: quantized + manual iterations
    // mirrors would duplicate logic — instead assert on the corpus run
    // below and on this fixture via a direct mini-Lloyd:
    var cents: Seq[Seq[Long]] = q.where($"vec_id" < Kmeans.K)
      .orderBy($"vec_id").as[(Long, Seq[Long])].collect().map(_._2).toSeq
    def assignOnce(cs: Seq[Seq[Long]]) = {
      val dists = array(cs.map(c =>
        aggregate(zip_with($"e", typedlit(c), (x, cc) => (x - cc) * (x - cc)),
          lit(0L), (a, x) => a + x)): _*)
      q.select($"vec_id",
        (array_position(dists, array_min(dists)) - 1L).cast("int").as("cluster"))
    }
    for (_ <- 0 until Kmeans.Iters) {
      val sums = assignOnce(cents)
        .join(q, "vec_id")
        .select($"cluster", posexplode($"e").as(Seq("i", "x")))
        .groupBy($"cluster", $"i").agg(sum($"x").as("sx"), count(lit(1)).as("c"))
        .collect().groupBy(_.getInt(0))
      cents = (0 until Kmeans.K).map { j =>
        sums.get(j).map { rows =>
          val byDim = rows.map(r => r.getInt(1) -> (r.getLong(2) / r.getLong(3))).toMap
          (0 until Kmeans.Dim).map(i => byDim(i)): Seq[Long]
        }.getOrElse(cents(j))
      }
    }
    val asg = assignOnce(cents).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (c <- 0 until 3; i <- 1 until 30)
      assert(asg(c * 30L + i) === asg(c * 30L), s"center $c split at $i")
    assert(Set(asg(0L), asg(30L), asg(60L)).size === 3, "centers merged")
  }

  test("corpus assignment: clusters partition the corpus, dist is the true argmin") {
    import spark.implicits._
    val out = Kmeans.kmeansAssign(spark, Sf).localCheckpoint()
    val n = graft.Tables.embeddings(spark, Sf).count()
    assert(out.count() === n)
    assert(out.select($"vec_id").distinct().count() === n)
    // recompute the distance of 25 sampled rows to every centroid in Scala
    val cents = Kmeans.train(spark, Sf)
    val q = Kmeans.quantized(graft.Tables.embeddings(spark, Sf))
      .select($"vec_id", $"e").as[(Long, Seq[Long])].collect().toMap
    out.orderBy($"vec_id").limit(25).collect().foreach { r =>
      val e = q(r.getLong(0))
      val dists = cents.map(c => c.zip(e).map { case (cc, x) =>
        val dd = x - cc; dd * dd }.sum)
      val best = dists.zipWithIndex.minBy { case (dv, j) => (dv, j) }
      assert(r.getInt(1) === best._2 && r.getLong(2) === best._1, r.toString)
    }
  }

  test("purity rows: counts consistent, majority is the argmax, lattice clustering beats chance") {
    val out = Kmeans.kmeansPurity(spark, Sf).collect()
    val n = graft.Tables.embeddings(spark, Sf).count()
    assert(out.map(_.getLong(1)).sum === n)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getLong(4) === 1000L * r.getLong(3) / r.getLong(1))
    }
    // 10 latent labels → chance purity ≈ 100‰; the clusters must do better
    val weighted = out.map(r => r.getLong(4) * r.getLong(1)).sum / n
    assert(weighted > 150L, s"weighted purity $weighted‰ is chance-level")
  }
}

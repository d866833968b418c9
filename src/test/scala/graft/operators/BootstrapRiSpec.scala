package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Poisson-bootstrap CI (Sampling.bootstrapCi) and referential-integrity
  * census (Audit.referentialIntegrity): first-principles recomputes and
  * planted-orphan ground truth. */
class BootstrapRiSpec extends SparkSuite {

  test("bootstrap CI matches a from-scratch Scala recompute") {
    val cents = Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), expr("cast(round(value * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cdf = Array(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119, 0.9999897508033253)
    def weight(eventId: Long, rep: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$eventId:$rep:bs42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(16.0, 15)
      val k = cdf.indexWhere(u < _)
      if (k < 0) 8L else k.toLong
    }
    val reps = 32
    val means = (0 until reps).map { rep =>
      val (swx, sw) = cents.foldLeft((0L, 0L)) { case ((x, w), (id, c)) =>
        val wi = weight(id, rep); (x + wi * c, w + wi)
      }
      100L * swx / sw
    }
    val sorted = means.sorted
    val got = Sampling.bootstrapCi(spark, Sf).head()
    assert(got.getLong(0) == reps)
    assert(got.getLong(1) == means.sum / reps, "mean of replicate means")
    assert(got.getLong(2) == sorted(1), "ci_lo = 2nd order statistic")
    assert(got.getLong(3) == sorted(30), "ci_hi = 31st order statistic")
    // the interval is sane: lo <= point estimate <= hi, and nondegenerate
    assert(got.getLong(2) <= got.getLong(1) && got.getLong(1) <= got.getLong(3))
    assert(got.getLong(2) < got.getLong(3), "CI collapsed to a point")
  }

  test("referential integrity counts planted orphans exactly") {
    import spark.implicits._
    val dir = tmpDir("graft-ri")
    // minimal star: 2 nations; 3 customers, one pointing at nation 9 (orphan)
    Seq((0, "A", 0), (1, "B", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, "c1", 0, 1.0, "m"), (2L, "c2", 1, 1.0, "m"), (3L, "c3", 9, 1.0, "m"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val got = Audit.referentialIntegrityEdge(spark,
      "customer.c_nationkey -> nation",
      graft.Tables.customer(spark, dir), "c_nationkey",
      graft.Tables.nation(spark, dir), "n_nationkey").head()
    assert(got.getString(0) == "customer.c_nationkey -> nation")
    assert(got.getLong(1) == 3L && got.getLong(2) == 1L && !got.getBoolean(3))
  }

  test("the full census is clean on the generated star schema") {
    val rows = Audit.referentialIntegrity(spark, Sf).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"edge ${r.getString(0)} has orphans")
      assert(r.getLong(2) == 0L)
    }
  }
}

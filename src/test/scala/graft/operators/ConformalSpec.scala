package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Split-conformal quality threshold (Classifier.conformalThreshold):
  * the selected cutoff IS the k-th order statistic (brute-force sort
  * recompute), k is the exact conformal index, and coverage behaves. */
class ConformalSpec extends SparkSuite {

  private def nonconf(text: String): Long = {
    val toks = text.split(" ", -1)
    -(10000L * toks.count(t => t == "the" || t == "a") / toks.length)
  }

  private def isCal(docId: Long): Boolean =
    java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.charAt(0) < '8'

  test("threshold is exactly the ceil(0.9(n+1))-th smallest calibration score") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cal = docs.filter(d => isCal(d._1)).map(d => nonconf(d._2)).sorted
    val k = (9L * (cal.length + 1) + 9L) / 10L
    val want = cal((k - 1).toInt)
    val r = Classifier.conformalThreshold(spark, Sf).head()
    assert(r.getLong(0) == cal.length, "n_cal")
    assert(r.getLong(1) == k, "k")
    assert(r.getLong(2) == want, "threshold != k-th order statistic")
    // empirical holdout coverage: expectation is 90%; a single split at
    // this n wobbles a few points, never collapses
    val test = docs.filterNot(d => isCal(d._1)).map(d => nonconf(d._2))
    val covered = test.count(_ <= want)
    assert(r.getLong(3) == test.length, "n_test")
    assert(r.getLong(4) == 10000L * covered / test.length, "coverage_e4")
    assert(r.getLong(4) > 8000L, s"coverage collapsed: ${r.getLong(4)}")
  }

  test("alpha tightens monotonically: smaller alpha -> higher threshold") {
    val r10 = Classifier.conformalThreshold(spark, Sf, alphaPct = 10).head()
    val r1 = Classifier.conformalThreshold(spark, Sf, alphaPct = 1).head()
    assert(r1.getLong(1) > r10.getLong(1), "k must grow as alpha shrinks")
    assert(r1.getLong(2) >= r10.getLong(2),
      "a stricter guarantee cannot lower the cutoff")
    assert(r1.getLong(4) >= r10.getLong(4),
      "stricter alpha must not reduce holdout coverage")
    assert(r10.getLong(1) <= r10.getLong(0), "k must be selectable (k <= n)")
  }
}

package graft.operators

import graft.SparkSuite

/** Ground-truth + plan-shape checks for TF-IDF top-k term extraction —
  * the oracle gate proves Spark≡DuckDB; this spec proves both compute
  * the intended scoring on a corpus where the answer is derivable by
  * hand, and that the top-k filter compiles to WindowGroupLimit. */
class TfidfSpec extends SparkSuite {

  import spark.implicits._

  test("tfidf ranks distinctive terms above ubiquitous ones") {
    // "common" appears in every doc (df=3 → idf = ln(4/4)+1 = 1);
    // "rare" only in doc 1 (df=1 → idf = ln(2)+1 ≈ 1.6931).
    // Doc 1: tf(common)=2 → 2.0; tf(rare)=1 → 1.6931; tf(mid)=1 …
    val d = Seq(
      (1L, "common common rare mid"),
      (2L, "common mid x1 x2"),
      (3L, "common y1 y2 y3")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopKOf(d, k = 2)
      .select($"doc_id", $"rnk", $"term")
      .as[(Long, Int, String)].collect().toSeq
    // doc 1: common 2×1.0 = 2.0 beats rare (ln 2 + 1 ≈ 1.6931); docs 2/3:
    // the df=1 terms (1.6931, tied, term-ordered) beat mid (df=2,
    // ln(4/3)+1 ≈ 1.2877) and common (df=3, 1.0)
    assert(out === Seq(
      (1L, 1, "common"), (1L, 2, "rare"),
      (2L, 1, "x1"), (2L, 2, "x2"),
      (3L, 1, "y1"), (3L, 2, "y2")))
  }

  test("top-k filter compiles to WindowGroupLimit (map-side pruning)") {
    val q = TextOps.tfidfTopK(spark, Sf)
    assert(q.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      plan.linesIterator.take(12).mkString("\n"))
  }
}

package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** First-principles ground truth for the bigram-LM perplexity filter
  * (the DuckDB oracle retrains the LM independently; these pin the
  * semantics on a hand-computed fixture and the structural invariants).
  */
class NgramLmSpec extends SparkSuite {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "a b a b"),
      (2L, "a a"),
      (3L, "b")).toDF("doc_id", "text")
  }

  test("bigram extraction: <s> start context, every token once as w2") {
    import spark.implicits._
    val big = NgramLm.bigramsOf(fixture).as[(Long, String, String)].collect().toSet
    // doc1: (<s>,a)(a,b)(b,a)(a,b); doc2: (<s>,a)(a,a); doc3: (<s>,b)
    assert(NgramLm.bigramsOf(fixture).count() === 7)
    assert(big === Set(
      (1L, "<s>", "a"), (1L, "a", "b"), (1L, "b", "a"),
      (2L, "<s>", "a"), (2L, "a", "a"), (3L, "<s>", "b")))
  }

  test("hand-computed LM score on the fixture") {
    // Corpus counts over all 7 bigram instances:
    //   c2: (<s>,a)=2 (<s>,b)=1 (a,b)=2 (b,a)=1 (a,a)=1
    //   c1: <s>=3 a=3 b=1;  V = |{a,b}| = 2
    // lnp(w1,w2) = ln((c2+1)/(c1+V)), lattice floor(x*1e6+0.5):
    def m(c2: Long, c1: Long): Long =
      math.floor(math.log((c2 + 1.0) / (c1 + 2.0)) * 1e6 + 0.5).toLong
    val exp = Map(
      1L -> (4L, m(2, 3) + m(2, 3) * 2 + m(1, 1)), // <s>a, ab, ba, ab
      2L -> (2L, m(2, 3) + m(1, 3)),
      3L -> (1L, m(1, 3)))
    val out = {
      // run the operator body on the fixture directly
      val big = NgramLm.bigramsOf(fixture)
      val c2 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val v = big.select(col("w2")).distinct().count()
      val lm = c2.join(c1, "w1").select(col("w1"), col("w2"),
        floor(log((col("c2") + lit(1.0)) / (col("c1") + lit(v.toDouble))) * 1e6 + 0.5)
          .cast("long").as("lnp_micro"))
      big.join(broadcast(lm), Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("lnp_micro")).as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    assert(out === exp)
  }

  test("corpus invariants: n_bigrams = token count, logppl exact division, kept consistent") {
    val out = NgramLm.bigramPpl(spark, Sf).localCheckpoint()
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    assert(out.join(docs, "doc_id")
      .where(col("n_bigrams") =!= col("n_tok")).count() === 0L)
    assert(out.where(
      col("logppl_micro") =!= expr("(-sum_lnp_micro) div n_bigrams") ||
        col("kept") =!= (col("logppl_micro") < NgramLm.KeepBelowMicro))
      .count() === 0L)
    // the threshold must actually split the corpus
    val kept = out.where(col("kept")).count()
    assert(kept > 0 && kept < out.count())
  }

  test("incremental LM: base artifact excludes the delta slice; merged counts equal full-corpus counts") {
    import spark.implicits._
    // force the artifact build, then inspect it
    NgramLm.bigramPplIncremental(spark, Sf).count()
    val base = graft.operators.SessionCaches
      .parquetArtifact(spark, s"lm-c2-base:$Sf")(_ => fail("must already exist"))
    val docs = graft.Tables.documents(spark, Sf)
    val baseExpected = NgramLm.bigramsOf(docs.where($"doc_id" % 10 =!= 7))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    assert(base.unionByName(baseExpected).distinct().count() ===
      baseExpected.count(), "base artifact drifted from the base slice")
    // delta merge reconstructs the full-corpus count table exactly
    val full = NgramLm.bigramsOf(docs)
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val delta = NgramLm.bigramsOf(docs.where($"doc_id" % 10 === 7))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val merged = base.unionByName(delta)
      .groupBy($"w1", $"w2").agg(sum($"c2").as("c2"))
    assert(merged.unionByName(full).distinct().count() === full.count(),
      "merged counts != full-corpus counts")
  }

  test("score is partitioning-invariant (lattice sums are exact)") {
    def run(parts: Int): Map[Long, Long] = {
      import spark.implicits._
      val docs = graft.Tables.documents(spark, Sf).repartition(parts)
      val big = NgramLm.bigramsOf(docs)
      val c2 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val c1 = big.groupBy($"w1").agg(count(lit(1)).as("c1"))
      val v = big.select($"w2").distinct().count()
      val lm = c2.join(c1, "w1").select($"w1", $"w2",
        floor(log(($"c2" + lit(1.0)) / ($"c1" + lit(v.toDouble))) * 1e6 + 0.5)
          .cast("long").as("lnp_micro"))
      big.join(broadcast(lm), Seq("w1", "w2"))
        .groupBy($"doc_id").agg(sum($"lnp_micro").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(run(3) === run(7))
  }
}

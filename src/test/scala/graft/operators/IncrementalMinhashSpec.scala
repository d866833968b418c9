package graft.operators

import graft.{SparkSuite, Tables}

/** Incremental batch-vs-corpus MinHash triage (Dedup.incrementalMinhashDedup):
  * exact triage on handcrafted corpus/batch fixtures (copy, near-copy,
  * novel, min-id election) and the planted-recovery + consistency
  * invariants on the real-corpus fixture. Value-level Jaccard correctness
  * of the flagged rows is also re-proved engine-independently by the
  * `dedup_minhash_incremental` invariant-twin oracle. */
class IncrementalMinhashSpec extends SparkSuite {
  import spark.implicits._

  private def triage(corpus: Seq[(Long, String)], batch: Seq[(Long, String)])
      : Map[Long, (Option[Long], Option[Double], String)] =
    Dedup.incrementalMinhashOf(
        corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"), 0.5)
      .as[(Long, Option[Long], Option[Double], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private val textA =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val textB =
    "completely different text about spark sql aggregation engines at scale"

  test("copy, near-copy and novel batch docs triage correctly") {
    val out = triage(
      corpus = Seq(1L -> textA, 2L -> textB),
      batch = Seq(
        100L -> textA, // exact copy of corpus 1
        101L -> (textA + " tonight"), // 12 of 13 shingles shared -> J=12/13
        102L -> "unrelated novel content entirely fresh words nothing shared"))
    assert(out(100L) == ((Some(1L), Some(1.0), "dup_corpus")), out(100L).toString)
    assert(out(101L) == ((Some(1L), Some(0.9231), "dup_corpus")), out(101L).toString)
    assert(out(102L) == ((None, None, "novel")), out(102L).toString)
  }

  test("a batch doc matching several corpus docs elects the min-id source") {
    val out = triage(
      corpus = Seq(7L -> textA, 3L -> textA, 9L -> textB),
      batch = Seq(100L -> textA))
    assert(out(100L) == ((Some(3L), Some(1.0), "dup_corpus")), out(100L).toString)
  }

  test("below-threshold overlap stays novel even when LSH surfaces the pair") {
    // one shared shingle out of many: candidate may band-collide but the
    // exact-Jaccard verify must reject it
    val out = triage(
      corpus = Seq(1L -> textA),
      batch = Seq(100L -> ("the quick brown cat naps under a warm stone wall today")))
    assert(out(100L) == ((None, None, "novel")), out(100L).toString)
  }

  test("real-corpus fixture: planted copies flag dup_corpus; membership and consistency hold") {
    val out = Dedup.incrementalMinhashDedup(spark, Sf)
      .as[(Long, Option[Long], Option[Double], String)].collect()
    val nBase = Tables.documents(spark, Sf).count()
    val naturals = (0L until nBase).filter(_ % 10 == 7).toSet
    val planted = (0L until nBase by 50L).map(_ + 1000000000L).toSet
    assert(out.map(_._1).toSet == naturals ++ planted)
    out.foreach { case (id, src, j, status) =>
      // status <-> fields consistency, threshold, and corpus-side sources
      assert((status == "dup_corpus") == src.nonEmpty, s"$id: $status/$src")
      assert(src.nonEmpty == j.nonEmpty, s"$id: $src/$j")
      j.foreach(v => assert(v >= 0.5 && v <= 1.0, s"$id: jaccard $v"))
      src.foreach { v =>
        assert(v % 10 != 7 && v < 1000000000L, s"$id: non-corpus src $v")
      }
    }
    val byId = out.map(r => r._1 -> r).toMap
    planted.foreach { id =>
      val (_, src, j, status) = byId(id)
      assert(status == "dup_corpus", s"planted $id: $status")
      // its own source (J=1.0) is always a candidate, so the min-id
      // election can only land at or below it
      assert(src.exists(_ <= id - 1000000000L), s"planted $id: src $src")
      if (src.contains(id - 1000000000L)) assert(j.contains(1.0), s"planted $id: $j")
    }
  }
}

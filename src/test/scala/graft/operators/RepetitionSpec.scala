package graft.operators

import graft.SparkSuite

/** First-principles ground truth for the Gopher repetition filters
  * (TextOps.repetitionStats): hand-computed fractions on degenerate and
  * clean fixtures, the overlapping-occurrence mass convention (mass > 1
  * on pathological docs), and the <2-token absence rule. The sf-corpus
  * run is covered by the fully independent DuckDB oracle
  * (`text_repetition_stats`). */
class RepetitionSpec extends SparkSuite {
  import spark.implicits._

  private def statsOf(rows: (Long, String)*): Map[Long, (Double, Double, Double, Double, Double, Int)] =
    TextOps.repetitionStatsOf(rows.toDF("doc_id", "text"))
      .as[(Long, Double, Double, Double, Double, Double, Int)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap

  test("alternating bigram doc: hand-computed top-n masses, no dup-5/6, dropped") {
    // "a b a b a b": nc=11; top-2 = "a b"×3·len3 = 9/11; top-3 = 10/11
    // ("a b a"×2·len5); top-4 = 14/11 ("a b a b"×2·len7, mass > 1);
    // every 5- and 6-gram is unique.
    val st = statsOf(1L -> "a b a b a b")(1L)
    assert(st == ((0.8182, 0.9091, 1.2727, 0.0, 0.0, 0)), st.toString)
  }

  test("period-5 doc: overlapping dup-5/6 mass exceeds 1, all rotations counted") {
    // "x y z w v" repeated 3×: nc=29. Every 5-gram is a rotation with
    // count 3 ("x y z w v") or 2 (the other four), each len 9:
    // dup5 = (3 + 4·2)·9 = 99/29; all five 6-gram rotations occur twice,
    // len 11: dup6 = 110/29. top2 = "x y"×3·len3 = 9/29, top3 = 15/29,
    // top4 = 21/29.
    val st = statsOf(2L -> "x y z w v x y z w v x y z w v")(2L)
    assert(st == ((0.3103, 0.5172, 0.7241, 3.4138, 3.7931, 0)), st.toString)
  }

  test("clean all-distinct doc passes every threshold") {
    // 30 distinct 3-char words: every n-gram unique, so top-n mass is one
    // occurrence of the longest gram (7/119, 11/119, 15/119) and dup-5/6
    // are zero — all five thresholds clear.
    val text = (1 to 30).map(i => f"a$i%02d").mkString(" ")
    val st = statsOf(3L -> text)(3L)
    assert(st == ((0.0588, 0.0924, 0.1261, 0.0, 0.0, 1)), st.toString)
  }

  test("docs with <2 tokens are absent; mixed batch keeps per-doc independence") {
    val out = statsOf(1L -> "hello", 2L -> "a b a b a b", 3L -> "x y")
    assert(out.keySet == Set(2L, 3L))
    // doc 3: one bigram "x y" (count 1, len 3), nc=3 -> top2 = 1.0, drop
    assert(out(3L) == ((1.0, 0.0, 0.0, 0.0, 0.0, 0)), out(3L).toString)
    assert(out(2L)._1 == 0.8182)
  }
}

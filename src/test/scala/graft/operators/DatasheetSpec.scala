package graft.operators

import graft.SparkSuite

/** Ground truth for the corpus datasheet (Datasheet.corpusDatasheet):
  * exact values on a hand-built corpus where every metric is computable
  * by inspection, and the cross-metric identities on the real corpus. */
class DatasheetSpec extends SparkSuite {
  import spark.implicits._

  test("hand-built corpus: every metric computable by inspection") {
    val dir = tmpDir("datasheet")
    // 4 docs: one exact-dup pair, lang en×3/de×1, sources a×2/b×2,
    // n_chars 10/10/20/40 -> lower median 10 (target rank (4+1)/2 = 2)
    val docs = Seq(
      (1L, (1 to 3).map(i => s"t$i").mkString(" "), "en", "a"), // 3 tokens
      (2L, (1 to 3).map(i => s"t$i").mkString(" "), "en", "a"), // exact dup of 1
      (3L, (1 to 5).map(i => s"u$i").mkString(" "), "en", "b"),
      (4L, (1 to 9).map(i => s"v$i").mkString(" "), "de", "b"))
      .map { case (id, t, l, src) =>
        val nc = Seq(10L, 10L, 20L, 40L)(id.toInt - 1)
        (id, t, l, src, nc)
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Datasheet.corpusDatasheet(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got("n_docs") === 4L)
    assert(got("n_tokens_total") === (3 + 3 + 5 + 9).toLong)
    assert(got("n_chars_total") === 80L)
    assert(got("chars_p50") === 10L)
    assert(got("n_langs") === 2L && got("n_sources") === 2L)
    assert(got("top_lang_share_e6") === 750000L)  // en 3/4
    assert(got("top_source_share_e6") === 500000L)
    assert(got("n_distinct_texts") === 3L)
    assert(got("exact_dup_rate_e6") === 250000L)  // 1 of 4
    // docs 1/2 are whole-text-gram twins -> novelty 0; 3/4 unique -> 1e6
    assert(got("mean_novelty_e6") === (0L + 0L + 1000000L + 1000000L) / 4)
    // near-dup counts come from the LSH pipeline on this tiny corpus —
    // only the identities need to hold here (exactness is the real-corpus
    // oracle's job against the committed golden)
    assert(got("near_dup_member_docs") >= got("near_dup_clusters"))
  }

  test("NULL lang/source counts as one census bucket; empty corpus fails fast") {
    // round-13 ADVICE: Spark's groupBy keeps a NULL group, DuckDB's
    // count(DISTINCT) drops NULLs — both engines now coalesce to a
    // U+0001 sentinel, so a NULL lang is one more bucket, not a desync.
    // Round-14 ADVICE: the sentinel sits OUTSIDE the value domain — a
    // document whose lang is literally the string "(null)" is its own
    // bucket, distinct from genuinely-NULL langs.
    val dir = tmpDir("datasheet-null")
    Seq(
      (1L, "a b c", Option("en"), Option("web"), 5L),
      (2L, "d e f", None: Option[String], Option("web"), 5L),
      (3L, "g h i", Option("en"), None: Option[String], 5L),
      (4L, "j k l", Option("(null)"), Option("web"), 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Datasheet.corpusDatasheet(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got("n_langs") === 3L,
      "en + NULL + the literal string \"(null)\" = 3 distinct language buckets")
    assert(got("n_sources") === 2L, "web + NULL = 2 source buckets")
    assert(got("top_lang_share_e6") === 1000000L * 2 / 4)
    assert(got("top_source_share_e6") === 1000000L * 3 / 4)

    // n > 0 but every text/n_chars NULL: the sums are NULL — must fail
    // with the all-NULL message, not NPE past the empty-corpus guard
    val nulls = tmpDir("datasheet-allnull")
    Seq((1L, None: Option[String], Option("en"), Option("web"),
        None: Option[Long]))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$nulls/documents.parquet")
    val en = intercept[IllegalArgumentException] {
      Datasheet.corpusDatasheet(spark, nulls).collect()
    }
    assert(en.getMessage.contains("NULL"))

    val empty = tmpDir("datasheet-empty")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$empty/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Datasheet.corpusDatasheet(spark, empty).collect()
    }
    assert(e.getMessage.contains("empty"))
  }

  test("real corpus: cross-metric identities hold") {
    val got = Datasheet.corpusDatasheet(spark, Sf)
      .as[(String, Long)].collect().toMap
    assert(got("n_distinct_texts") <= got("n_docs"))
    assert(got("exact_dup_rate_e6") ===
      1000000L * (got("n_docs") - got("n_distinct_texts")) / got("n_docs"))
    assert(got("near_dup_rate_e6") ===
      1000000L * got("near_dup_member_docs") / got("n_docs"))
    assert(got("near_dup_member_docs") >= 2 * got("near_dup_clusters"),
      "every cluster has at least two members")
    assert(got("chars_p50") > 0 && got("chars_p50") <= got("n_chars_total"))
    assert(got("mean_novelty_e6") >= 0 && got("mean_novelty_e6") <= 1000000L)
    assert(got("top_lang_share_e6") * got("n_langs") >= 1000000L,
      "the top language must carry at least an even share")
  }
}

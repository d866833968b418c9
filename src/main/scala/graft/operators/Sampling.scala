package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpus sampling — the selection ops a training-data
  * pipeline runs before anything expensive. All of them key on a hex
  * prefix of `md5(doc_id)` instead of `rand()`: a hash threshold is
  *
  *  - reproducible across runs, partitionings, and executor counts
  *    (`rand(seed)` seeds per-partition, so the sample silently changes
  *    whenever the scan splits differently — a real pipeline cannot
  *    version its training set on that);
  *  - a narrow per-row filter pushed to the scan — no shuffle, no
  *    global pass, identical cost at 100 TB;
  *  - portable SQL (md5 hex is engine-independent), so unlike `rand`
  *    sampling these are ORACLE-CHECKED, not rows-only.
  *
  * The hex-prefix comparison is a uniform [0,1) draw in disguise: the
  * first two hex chars are uniform over 256 values, so `< "28"` keeps
  * 40/256 ≈ 15.6%.
  */
object Sampling {

  private def hexPrefix(n: Int) =
    substring(md5(col("doc_id").cast("string")), 1, n)

  /** Stratified sample: per-language keep fractions (English kept at
    * 40/256, the rest at 20/256 — the downsample-the-dominant-language
    * shape every multilingual corpus build runs). */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(hexPrefix(2) <
        when($"lang" === "en", lit("28")).otherwise(lit("14")))
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  val stratifiedSampleOracle: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |      (CASE WHEN lang = 'en' THEN '28' ELSE '14' END)
      |ORDER BY doc_id""".stripMargin

  /** Deterministic train/test split: first hex char < 'c' → train
    * (12/16 = 75%). Reported as per-(split, lang) counts — the shape a
    * split audit reads; the assignment itself is the same narrow
    * expression applied to any downstream query. */
  def trainTestSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("split",
        when(hexPrefix(1) < "c", lit("train")).otherwise(lit("test")))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      .orderBy($"split", $"lang")
  }

  val trainTestSplitOracle: String =
    """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
      |            THEN 'train' ELSE 'test' END AS split,
      |       lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars
      |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("doc_stratified_sample", Some(stratifiedSampleOracle), stratifiedSample),
    Q("doc_train_test_split", Some(trainTestSplitOracle), trainTestSplit))
}

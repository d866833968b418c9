package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Linear text-classifier inference — the fastText-shaped quality/toxicity
  * scorer every corpus build runs over 100 TB to gate documents into the
  * training set (the published CCNet / LLaMA / GPT-3 quality-filter
  * stage): hash each token into a weight table, average the weights,
  * threshold the score.
  *
  * The weight table here is hash-derived (w(t) = (h32(t) mod 1000 − 500)
  * / 1000, i.e. a fixed pseudo-random linear head) so the whole scorer is
  * engine-portable and ORACLE-CHECKED — the md5-based hash plays the role
  * the learned embedding matrix plays in production. With learned
  * weights the only change is a broadcast float array indexed by the same
  * hash (the [[graft.functions.CountMinAggregator]] broadcast-lookup
  * pattern); the plan shape below is already the production one.
  *
  * Scale shape: narrow explode → per-token weight is a pure projection →
  * ONE map-side-combinable aggregation keyed on doc_id (the token rows of
  * a document are co-located with it, so partial sums absorb almost all
  * of the explode fan-out before the shuffle). Per-token weights and the
  * per-doc logit are EXACT integers (milli-units), so cross-engine
  * summation order cannot flip anything.
  */
object Classifier {

  /** Per-document linear score and accept/reject label. */
  def qualityClassifier(s: SparkSession, d: String): DataFrame =
    qualityClassifierOf(Tables.documents(s, d))

  def qualityClassifierOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val tok = docs
      .select($"doc_id", explode(split($"text", " ")).as("t"))
    val h = conv(substring(md5($"t"), 1, 8), 16, 10).cast("long")
    tok
      .select($"doc_id", (h % 1000 - 500).as("w_milli"))
      .groupBy($"doc_id")
      .agg(sum($"w_milli").as("sum_milli"), count(lit(1)).as("n_tokens"))
      .select(
        $"doc_id", $"n_tokens",
        // The raw logit stays in EXACT milli-units (a BIGINT): dividing to
        // a per-token mean and rounding lands on half-boundaries whenever
        // n_tokens is a power of two (observed flipping at sf0.01), and
        // the threshold decision only needs the sign anyway.
        $"sum_milli".as("logit_milli"),
        ($"sum_milli" > 0).as("accepted"))
      .orderBy($"doc_id")
  }

  val qualityClassifierOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |w AS (
      |  SELECT doc_id,
      |         (CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1000) - 500 AS w_milli
      |  FROM tok)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(w_milli) AS BIGINT) AS logit_milli,
      |       sum(w_milli) > 0 AS accepted
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("text_quality_classifier", Some(qualityClassifierOracle), qualityClassifier))
}

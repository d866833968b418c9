package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.MisraGries

/** Misra–Gries heavy-hitter queries — the deterministic-guarantee
  * frequency complement to the CMS top-k (EventOps.userCmsTopK). The
  * oracle harness is the frequency analog of [[QuantileGuard]]: summary
  * contents depend on merge order (which is why raw estimates can't be
  * hash-compared across engines), but two facts are THEOREMS independent
  * of any order and so deterministic:
  *
  *  1. the exact top-k keys and counts — recomputed by DuckDB;
  *  2. the Misra–Gries guarantee, asserted over EVERY summary entry
  *     joined back to the exact counts: est ≤ true and
  *     est ≥ true − ⌊n/(k+1)⌋ (`bound_ok`), and every key whose true
  *     count exceeds ⌊n/(k+1)⌋ is present in the summary
  *     (`coverage_ok`). A broken add or merge (the truncation step is
  *     where implementations classically lose the bound) flips a flag
  *     and fails the hash compare.
  *
  * Scale shape: the summary is one all-reduce of O(k) ≈ 1 KB state with
  * map-side partial merge — no shuffle of raw keys; the guard join
  * broadcasts the ≤ k summary entries back against the per-key exact
  * aggregate (one hash shuffle, the same one any exact top-k pays). The
  * rollup twin proves the 100 TB serving pattern: build per-minute cells
  * once, answer any coarser-grain heavy-hitter question from the cells
  * alone — the raw table is never re-touched, and the mergeable-summaries
  * theorem says the re-slice keeps the SAME n/(k+1) bound, not a weaker
  * one (asserted by the guard passing on the merged summary).
  */
object HeavyHitters {

  /** Small enough that evictions/truncations actually fire at every test
    * SF (events carry ~150 distinct users), so the guard exercises the
    * lossy path rather than an exact map. */
  private val K = 32

  /** Exact per-user counts + the guard flags for a summary built by
    * `build`. Output: top-10 exact (user_id, cnt) rows, each carrying the
    * two theorem flags. */
  private def guarded(s: SparkSession, d: String)(
      build: DataFrame => MisraGries.Summary): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).select($"user_id")
    val summary = build(ev)
    val bound = summary.errorBound
    val entriesDf = summary.entries.toDF("user_id", "est")
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("cnt"))
    // flags: one aggregate over exact⟕entries (entries ≤ k rows,
    // broadcast); the 1-row collect is bounded by construction
    val flags = exact.join(broadcast(entriesDf), Seq("user_id"), "left")
      .agg(
        min(when($"est".isNull ||
          ($"est" <= $"cnt" && $"est" >= $"cnt" - bound), 1).otherwise(0))
          .as("bound_ok"),
        min(when($"cnt" > bound && $"est".isNull, 0).otherwise(1))
          .as("coverage_ok"))
      .head()
    exact.orderBy($"cnt".desc, $"user_id").limit(10)
      .select($"user_id", $"cnt",
        lit(flags.getInt(0)).as("bound_ok"),
        lit(flags.getInt(1)).as("coverage_ok"))
  }

  /** Direct build: one all-reduce of the O(k) summary over user_id. */
  def mgTopkCheck(s: SparkSession, d: String): DataFrame =
    guarded(s, d) { ev =>
      import s.implicits._
      MisraGries.deserialize(
        ev.as[Long].select(new MisraGries.MgFromKeys(K).toColumn).head())
    }

  /** The mergeability proof: build one serialized summary CELL per
    * minute — the maintained-view grain — then merge the cells with
    * `MgMergeAgg` and guard the MERGED summary. Passing certifies the
    * minute→total re-slice keeps the full n/(k+1) deterministic bound. */
  def mgRollupGrains(s: SparkSession, d: String): DataFrame =
    guarded(s, d) { _ =>
      import s.implicits._
      val mgVal = udaf(new MisraGries.MgFromKeys(K), Encoders.scalaLong)
      val cells = Tables.events(s, d)
        .select(date_trunc("minute", $"ts").as("m"), $"user_id")
        .groupBy($"m")
        .agg(mgVal($"user_id").as("sk"))
      MisraGries.deserialize(
        cells.select($"sk").as[Array[Byte]]
          .select(new MisraGries.MgMergeAgg(K).toColumn).head())
    }

  /** Misra–Gries where the guarantee actually BITES: corpus tokens are
    * zipfian, so the head words exceed the n/(k+1) threshold by orders
    * of magnitude and the coverage theorem guarantees they survive k=64
    * slots against thousands of distinct tokens — the exact situation
    * (feed-the-tokenizer frequency tables, stopword discovery) a 100 TB
    * text pipeline runs this for. Same guard as the user queries but
    * string-keyed ([[MisraGries.SummaryS]]); tokenization mirrors
    * text_word_count so the oracle shares its proven split semantics. */
  def mgTokensCheck(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(explode(split($"text", " ")).as("token"))
    val summary = MisraGries.deserializeS(
      toks.as[String].select(new MisraGries.MgFromStrings(64).toColumn).head())
    val bound = summary.errorBound
    val entriesDf = summary.entries.toDF("token", "est")
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val flags = exact.join(broadcast(entriesDf), Seq("token"), "left")
      .agg(
        min(when($"est".isNull ||
          ($"est" <= $"cnt" && $"est" >= $"cnt" - bound), 1).otherwise(0))
          .as("bound_ok"),
        min(when($"cnt" > bound && $"est".isNull, 0).otherwise(1))
          .as("coverage_ok"))
      .head()
    exact.orderBy($"cnt".desc, $"token").limit(10)
      .select($"token", $"cnt",
        lit(flags.getInt(0)).as("bound_ok"),
        lit(flags.getInt(1)).as("coverage_ok"))
  }

  val tokensOracleSql: String =
    """WITH ex AS (
      |  SELECT token, count(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |  GROUP BY token)
      |SELECT token, CAST(cnt AS BIGINT) AS cnt,
      |       CAST(1 AS INT) AS bound_ok, CAST(1 AS INT) AS coverage_ok
      |FROM ex ORDER BY cnt DESC, token LIMIT 10""".stripMargin

  val oracleSql: String =
    """WITH ex AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
      |SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
      |       CAST(1 AS INT) AS bound_ok, CAST(1 AS INT) AS coverage_ok
      |FROM ex ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("agg_mg_topk_check", Some(oracleSql), mgTopkCheck),
    Q("agg_mg_rollup_grains", Some(oracleSql), mgRollupGrains),
    Q("text_heavy_tokens_check", Some(tokensOracleSql), mgTokensCheck))
}

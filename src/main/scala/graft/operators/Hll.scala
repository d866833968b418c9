package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark as `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *
  * THE pre-aggregation pattern for distinct counts at 100 TB:
  * `COUNT(DISTINCT)` does not decompose over partial aggregates — every
  * re-slicing of the question (per-day → per-week → per-source → total)
  * forces another full pass over raw events, because the distinct SETS,
  * not their sizes, have to be carried between grains. An HLL sketch
  * column decomposes: build the sketch ONCE at the finest grain you will
  * ever ask about, persist the few-KB sketch bytes next to the additive
  * counters in the rollup (plain parquet `binary` — [[userSketchRollup]]),
  * and answer every coarser grain by `hll_union_agg` over ~bytes. Raw
  * events are never re-touched; the union is associative and commutative,
  * so it map-side-combines and re-shuffles like any algebraic aggregate.
  * Same family as the CMS rollup (CountMinAggregator.scala), but for
  * cardinality instead of frequency.
  *
  * Exactness note, and how these queries are oracle-checked: a
  * DataSketches HLL sketch is exact only while in coupon mode (a few
  * hundred distincts at lgK=12 — the sf0.01 corpus's 150 users stay
  * exact; sf0.1's ~1.3k users/day do NOT: the estimate lands within the
  * published ~1.6% RSE, e.g. 1488 for 1500 exact). So equality against
  * `COUNT(DISTINCT)` is the wrong oracle beyond toy scale — the committed
  * check is the CMS pattern: the golden pins the (deterministic —
  * register-max union is merge-order-free) estimates, and the DuckDB SQL
  * independently recomputes the exact cardinalities from events and
  * collapses any estimate off by >4% (≈2.5σ) to −1, while the additive
  * day/events columns are recomputed exactly. HllSpec pins the exact
  * regime, the parquet round-trip of the sketch bytes, re-slicing
  * equivalence, and the approximate regime's error bound on a 50k-id
  * corpus.
  */
object Hll {

  /** The persisted rollup at the finest grain: one row per
    * (day, event_type) carrying the mergeable user-id sketch plus the
    * additive event counter. At scale this table is what a nightly job
    * appends to — a few KB per cell, irrespective of event volume. */
  def userSketchRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type")
      .agg(hll_sketch_agg($"user_id").as("user_sketch"),
        count(lit(1)).as("events"))
  }

  /** Per-day distinct users answered FROM the (day, type) rollup grain by
    * unioning sketches across types — the twin of `ev_daily_active_users`
    * that never expands a distinct set: the second aggregation's state is
    * sketch bytes, so the shuffle after the rollup carries days × KB no
    * matter how many users exist. */
  def hllDailyUsers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    userSketchRollup(s, d)
      .groupBy($"day")
      .agg(hll_sketch_estimate(hll_union_agg($"user_sketch")).as("dau"),
        sum($"events").as("events"))
      .orderBy($"day")
  }

  val hllDailyUsersOracle: String =
    s"""WITH ex AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
       |                   count(DISTINCT user_id) AS exact_dau,
       |                   CAST(count(*) AS BIGINT) AS events
       |            FROM events GROUP BY 1),
       |g AS (${Golden.dispatch("ev_hll_daily_users")})
       |SELECT ex.day,
       |       CASE WHEN abs(g.dau - ex.exact_dau) <= 0.04 * ex.exact_dau
       |            THEN g.dau ELSE -1 END AS dau,
       |       ex.events
       |FROM ex LEFT JOIN g USING (day) ORDER BY ex.day""".stripMargin

  /** Corpus-total distinct users from the same rollup — the "any coarser
    * grain for free" readout: one union over every cell's sketch, a single
    * row to the driver. */
  def hllTotalUsers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    userSketchRollup(s, d)
      .agg(hll_sketch_estimate(hll_union_agg($"user_sketch")).as("users"),
        sum($"events").as("events"))
  }

  val hllTotalUsersOracle: String =
    s"""WITH ex AS (SELECT count(DISTINCT user_id) AS exact_users,
       |                   CAST(count(*) AS BIGINT) AS events
       |            FROM events),
       |g AS (${Golden.dispatch("ev_hll_union_total")})
       |SELECT CASE WHEN abs(g.users - ex.exact_users) <= 0.04 * ex.exact_users
       |            THEN g.users ELSE -1 END AS users,
       |       ex.events
       |FROM g CROSS JOIN ex""".stripMargin

  /** Distinct-user OVERLAP between every pair of event types by
    * inclusion–exclusion over the same sketches: |A∩B| ≈ est(A) + est(B)
    * − est(A∪B) (HLLs union exactly; they cannot intersect directly —
    * inclusion–exclusion is the standard readout, error compounding
    * across the three estimates). All arithmetic on the readout side is
    * exact integer math over the three Long estimates, clamped at 0.
    *
    * Scale shape: the per-type sketch relation is |event types|-bounded —
    * the engine's driver-scalar pattern (CMS/BM25 stats) — so the pair
    * expansion is driver-side over a handful of KB sketches, never a
    * relational self-join (which would plan as a nested-loop under an
    * inequality condition). Raw events are touched once, by the rollup. */
  def hllTypeOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perType = userSketchRollup(s, d)
      .groupBy($"event_type")
      .agg(hll_union_agg($"user_sketch").as("sk"))
      .collect() // bounded: one row per event type
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    val pairs = for {
      (ta, sa) <- perType.toSeq
      (tb, sb) <- perType.toSeq if ta < tb
    } yield (ta, tb, sa, sb)
    pairs.toDF("type_a", "type_b", "sk_a", "sk_b")
      .select($"type_a", $"type_b",
        hll_sketch_estimate($"sk_a").as("users_a"),
        hll_sketch_estimate($"sk_b").as("users_b"),
        hll_sketch_estimate(hll_union($"sk_a", $"sk_b")).as("users_union"))
      .withColumn("users_intersect",
        greatest($"users_a" + $"users_b" - $"users_union", lit(0L)))
      .orderBy($"type_a", $"type_b")
  }

  /** CMS-pattern oracle: golden pins the deterministic estimates; DuckDB
    * recomputes every exact cardinality from events and collapses any
    * single-set/union estimate beyond ~2.5σ (4%), and any intersection
    * beyond the compounded inclusion–exclusion envelope (12% of the
    * union), to −1. */
  val hllTypeOverlapOracle: String =
    s"""WITH ua AS (SELECT DISTINCT event_type, user_id FROM events),
       |c AS (SELECT event_type, count(*) AS cnt FROM ua GROUP BY 1),
       |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
       |             count(*) AS exact_int
       |      FROM ua a JOIN ua b
       |        ON a.user_id = b.user_id AND a.event_type < b.event_type
       |      GROUP BY 1, 2),
       |p AS (SELECT ca.event_type AS type_a, cb.event_type AS type_b,
       |             ca.cnt AS exact_a, cb.cnt AS exact_b
       |      FROM c ca JOIN c cb ON ca.event_type < cb.event_type),
       |ex AS (SELECT p.type_a, p.type_b, p.exact_a, p.exact_b,
       |              p.exact_a + p.exact_b - COALESCE(i.exact_int, 0)
       |                AS exact_union,
       |              COALESCE(i.exact_int, 0) AS exact_int
       |       FROM p LEFT JOIN i
       |         ON i.type_a = p.type_a AND i.type_b = p.type_b),
       |g AS (${Golden.dispatch("ev_hll_intersect")})
       |SELECT ex.type_a, ex.type_b,
       |       CASE WHEN abs(g.users_a - ex.exact_a) <= 0.04 * ex.exact_a
       |            THEN g.users_a ELSE -1 END AS users_a,
       |       CASE WHEN abs(g.users_b - ex.exact_b) <= 0.04 * ex.exact_b
       |            THEN g.users_b ELSE -1 END AS users_b,
       |       CASE WHEN abs(g.users_union - ex.exact_union) <= 0.04 * ex.exact_union
       |            THEN g.users_union ELSE -1 END AS users_union,
       |       CASE WHEN abs(g.users_intersect - ex.exact_int)
       |                 <= 0.12 * greatest(ex.exact_union, 1)
       |            THEN g.users_intersect ELSE -1 END AS users_intersect
       |FROM ex JOIN g ON g.type_a = ex.type_a AND g.type_b = ex.type_b
       |ORDER BY ex.type_a, ex.type_b""".stripMargin

  /** Trailing 7-day distinct users (WAU) per day, answered ENTIRELY from
    * the daily sketch rollup — the signature payoff of mergeable
    * cardinality state: `COUNT(DISTINCT)` over a sliding window re-scans
    * every raw event 7 times (each event belongs to 7 windows), while the
    * sketch path touches raw events ONCE (the daily rollup, which a
    * nightly job already maintains) and then unions days×KB sketch bytes.
    * Shape: each day cell fans out to the ≤7 window-days it contributes
    * to (`explode` over the offset range — days×7 rows of bytes, never
    * row-scale), one hash shuffle on the window day, `hll_union_agg` per
    * window. The additive event counter rides the same fan-out. Output
    * days are restricted to days present in the corpus (broadcast
    * semi-join with the ~days-row day list). MEASURED (TrailingWauProbe,
    * SCALE_NOTES Leg 28; 10M events / 2M users / 30 days): serve 0.81 s
    * from the rollup vs 18.67 s for the naive 7×-rescan — ~23×, worst
    * window error 1.59% (inside the ~1.6% RSE), and the gap grows with
    * corpus size since the serve's cost is O(cells), not O(rows).
    *
    * Oracle: the CMS/HLL invariant-twin pattern — DuckDB recomputes the
    * EXACT trailing distinct count from raw events and collapses any
    * estimate off by >4% (≈2.5σ at lgK=12) to −1; the additive
    * `events_7d` column is recomputed exactly; the golden pins the
    * deterministic estimates themselves (register-max union is
    * merge-order-free — HllSpec). */
  def hllTrailingUsers(s: SparkSession, d: String, days: Int = 7): DataFrame = {
    import s.implicits._
    val daily = userSketchRollup(s, d)
      .groupBy($"day")
      .agg(hll_union_agg($"user_sketch").as("sk"), sum($"events").as("events"))
    val present = daily.select($"day".as("wday"))
    daily
      .withColumn("off", explode(sequence(lit(0), lit(days - 1))))
      .withColumn("wday",
        date_format(date_add(to_date($"day"), $"off"), "yyyy-MM-dd"))
      .join(broadcast(present), Seq("wday"), "left_semi")
      .groupBy($"wday")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("wau"),
        sum($"events").as("events_7d"))
      .select($"wday".as("day"), $"wau", $"events_7d")
      .orderBy($"day")
  }

  val hllTrailingUsersOracle: String =
    s"""WITH byday AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
       |ex AS (SELECT d.day, count(DISTINCT b.user_id) AS exact_wau,
       |              CAST(count(*) AS BIGINT) AS events_7d
       |       FROM (SELECT DISTINCT day FROM byday) d
       |       JOIN byday b ON b.day BETWEEN d.day - 6 AND d.day
       |       GROUP BY d.day),
       |g AS (${Golden.dispatch("ev_hll_trailing_7d")})
       |SELECT strftime(ex.day, '%Y-%m-%d') AS day,
       |       CASE WHEN abs(g.wau - ex.exact_wau) <= 0.04 * ex.exact_wau
       |            THEN g.wau ELSE -1 END AS wau,
       |       ex.events_7d
       |FROM ex LEFT JOIN g ON g.day = strftime(ex.day, '%Y-%m-%d')
       |ORDER BY day""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("ev_hll_daily_users", Some(hllDailyUsersOracle), hllDailyUsers),
    Q("ev_hll_trailing_7d", Some(hllTrailingUsersOracle), (s, d) => hllTrailingUsers(s, d)),
    Q("ev_hll_union_total", Some(hllTotalUsersOracle), hllTotalUsers),
    Q("ev_hll_intersect", Some(hllTypeOverlapOracle), hllTypeOverlap))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket co-occurrence mining over the event stream — the
  * association-rule readout (support / confidence / lift; Agrawal &
  * Srikant 1994's A-priori statistics at pair depth) a curation pipeline
  * uses to find event types that travel together before building funnels
  * or session features from them.
  *
  * Scale shape (100 TB posture): the ONLY row-scale pass is the initial
  * `DISTINCT (user, day, type)` collapse — one shuffle, after which
  * everything is bounded by baskets × itemset size. The within-basket
  * pair join is an equi-join on the basket key (user, day), so each
  * basket meets only itself; with an item domain of m types a basket
  * yields ≤ m·(m−1)/2 pairs (m = 5 here ⇒ ≤ 10), so the join output is
  * O(baskets·m²) — never the all-pairs cross of naive basket mining. The
  * item-frequency table is m rows — broadcast. Basket count N is one
  * driver scalar.
  *
  * All ratio outputs are exact integer micro fixed point (⌊1e4·num/den⌋,
  * integer `div` truncates toward zero identically on both engines) —
  * no float summation-order or rounding-mode risk in the oracle compare.
  * Overflow bound: the lift numerator 1e4·n_ab·N stays in i64 through
  * n_ab·N < 9.2e14 — safe to ~3e7 baskets even with every pair
  * co-occurring everywhere; past that, compute lift in DECIMAL (both
  * engines have it) at the same plan shape. ANSI Spark throws rather
  * than wraps, so an overflow is loud, not wrong.
  */
object Basket {

  /** Pair-level association rules over (user, day) baskets of event
    * types: for every unordered type pair a<b, the basket co-occurrence
    * count, support·1e4, confidence(a→b)·1e4 and lift·1e4. */
  def itemPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val items = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day"), $"event_type")
      .distinct()
    // one bounded driver scalar: the number of baskets
    val nBaskets = items.select($"user_id", $"day").distinct().count()
    val itemN = items.groupBy($"event_type").agg(count(lit(1)).as("ni"))
    val pairs = items.as("a")
      .join(items.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.day" === $"b.day" &&
          $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(itemN.select($"event_type".as("type_a"), $"ni".as("n_a"))), "type_a")
      .join(broadcast(itemN.select($"event_type".as("type_b"), $"ni".as("n_b"))), "type_b")
      .select($"type_a", $"type_b", $"n_ab", $"n_a", $"n_b",
        expr(s"(10000 * n_ab) div ${nBaskets}L").as("support_e4"),
        expr("(10000 * n_ab) div n_a").as("confidence_e4"),
        expr(s"(10000 * n_ab * ${nBaskets}L) div (n_a * n_b)").as("lift_e4"))
      .orderBy($"type_a", $"type_b")
  }

  val itemPairsOracle: String =
    """WITH items AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      |  FROM events),
      |nb AS (SELECT count(*) AS n FROM (
      |         SELECT DISTINCT user_id, day FROM items)),
      |item_n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ni
      |           FROM items GROUP BY 1),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |             CAST(count(*) AS BIGINT) AS n_ab
      |      FROM items a JOIN items b
      |        ON a.user_id = b.user_id AND a.day = b.day
      |       AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, p.n_ab, ia.ni AS n_a, ib.ni AS n_b,
      |       CAST((10000 * p.n_ab) // nb.n AS BIGINT) AS support_e4,
      |       CAST((10000 * p.n_ab) // ia.ni AS BIGINT) AS confidence_e4,
      |       CAST((10000 * p.n_ab * nb.n) // (ia.ni * ib.ni) AS BIGINT) AS lift_e4
      |FROM p
      |CROSS JOIN nb
      |JOIN item_n ia ON ia.event_type = p.type_a
      |JOIN item_n ib ON ib.event_type = p.type_b
      |ORDER BY p.type_a, p.type_b""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("mba_item_pairs", Some(itemPairsOracle), itemPairs))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal operators Spark has no dedicated primitive for, composed from
  * built-ins per the builder-brief preference order (a):
  *
  *  - as-of join: realized as a single sort + running `last(ignoreNulls)`
  *    window — NO join at all. At 100 TB this is one shuffle on the key,
  *    versus the naive time-range self-join which is quadratic per key.
  *  - sessionization: gap-based session ids via lag + running sum — the
  *    standard two-window formulation, one shuffle on the key.
  *
  * All event-time comparisons truncate to microseconds on both engines
  * (Spark TimestampType is µs; the oracle casts TIMESTAMP_NS → TIMESTAMP).
  */
object Temporal {

  /** As-of join (attribution): for every purchase, the most recent click by
    * the same user at-or-before the purchase (ties on the µs timestamp
    * broken by event_id — makes both engines fully deterministic). */
  def asofClickAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("click_id",
        when($"event_type" === "click", $"event_id"))
      .withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"last_click_id")
      .orderBy($"event_id")
  }

  val asofOracle: String =
    """SELECT p.event_id, p.user_id,
      |  (SELECT c.event_id FROM events c
      |   WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |     AND (CAST(c.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)
      |          OR (CAST(c.ts AS TIMESTAMP) = CAST(p.ts AS TIMESTAMP)
      |              AND c.event_id < p.event_id))
      |   ORDER BY CAST(c.ts AS TIMESTAMP) DESC, c.event_id DESC
      |   LIMIT 1) AS last_click_id
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin

  /** Gap-based sessionization: a new session starts after >30 min of user
    * inactivity. Output: one row per session with event count and start. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("brk",
        when(lag($"ts", 1).over(byUser).isNull ||
          $"ts" - lag($"ts", 1).over(byUser) > expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_no", sum($"brk").over(running))
      .groupBy($"user_id", $"session_no")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy($"user_id", $"session_no")
  }

  val sessionizeOracle: String =
    """WITH g AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER
      |           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
      |         OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER
      |           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |            > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sess AS (
      |  SELECT user_id, uts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM g)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       strftime(min(uts), '%Y-%m-%d %H:%M:%S') AS session_start
      |FROM sess GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  /** Native session windows: Spark's first-class `session_window` operator
    * (the same expression works under readStream for streaming sessions).
    * Oracle: the lag+running-sum formulation — two independent derivations
    * of the same sessions. */
  def sessionWindowNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  val sessionWindowOracle: String =
    """WITH g AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER
      |           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
      |         OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER
      |           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |            >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sess AS (
      |  SELECT user_id, uts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sno
      |  FROM g)
      |SELECT user_id,
      |       strftime(min(uts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM sess GROUP BY user_id, sno
      |ORDER BY user_id, session_start""".stripMargin

  /** Range (interval) join: for every view, purchases by the same user in
    * the following hour. Spark has no native range join, and the naive
    * non-equi join plans as a nested loop — instead both sides are bucketed
    * to the hour and joined on (user, bucket) with the purchase replicated
    * into its own and the previous bucket (a pair at distance ≤1h spans at
    * most adjacent buckets, and lands in exactly one replica's key), then
    * the exact range predicate filters inside the bucket. One equi-join
    * shuffle; scales linearly where the nested loop is quadratic. */
  def rangeJoinPurchasesAfterView(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val views = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts".as("vts"),
        floor(unix_timestamp($"ts") / 3600).as("bucket"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts".as("pts"),
        explode(array(floor(unix_timestamp($"ts") / 3600),
          floor(unix_timestamp($"ts") / 3600) - 1)).as("p_bucket"))
    // The range predicate must be part of the JOIN condition: filtering
    // after a left join would drop views whose bucket matches all fail the
    // range check, instead of keeping them with count 0. Catalyst extracts
    // the equi-keys (user, bucket) for the hash join and applies the range
    // as the join residual.
    views.join(purchases,
        $"user_id" === $"p_user" && $"bucket" === $"p_bucket" &&
          $"pts" > $"vts" && $"pts" <= $"vts" + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .groupBy($"view_id")
      .agg(count($"purchase_id").as("purchases_1h"))
      .orderBy($"view_id")
  }

  val rangeJoinOracle: String =
    """SELECT v.event_id AS view_id,
      |       CAST(count(p.event_id) AS BIGINT) AS purchases_1h
      |FROM events v LEFT JOIN events p
      |  ON p.user_id = v.user_id AND p.event_type = 'purchase'
      | AND CAST(p.ts AS TIMESTAMP) >  CAST(v.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR
      |WHERE v.event_type = 'view'
      |GROUP BY v.event_id ORDER BY view_id""".stripMargin

  /** Linear multi-touch attribution: every purchase's value is split
    * EVENLY across the user's clicks in the preceding hour (the standard
    * linear model; [[asofClickAttribution]] is its last-touch sibling),
    * then re-aggregated per user. Purchases with no qualifying touch drop
    * out (a "direct" bucket is the same query with a left join).
    *
    * Scale shape: the touch join is the bucketed range join of
    * [[rangeJoinPurchasesAfterView]] — the hour-bucket explode gives
    * Catalyst (user, bucket) equi-keys so the range is a hash-join
    * residual, never a nested loop. The per-purchase touch count is a
    * window over the purchase key (co-partitioned with the join output),
    * and the per-touch shares are decimal-quantized before the per-user
    * sum so cross-engine order cannot flip the round. */
  def multitouchAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("cts"),
        floor(unix_timestamp($"ts") / 3600).as("bucket"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts".as("pts"), $"value",
        explode(array(floor(unix_timestamp($"ts") / 3600),
          floor(unix_timestamp($"ts") / 3600) - 1)).as("p_bucket"))
    val touches = clicks.join(purchases,
      $"user_id" === $"p_user" && $"bucket" === $"p_bucket" &&
        $"cts" >= $"pts" - expr("INTERVAL 1 HOUR") && $"cts" < $"pts")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"purchase_id")
    touches
      .withColumn("n_touches", count(lit(1)).over(w))
      .select($"user_id",
        ($"value" / $"n_touches").cast("decimal(28,8)").as("share"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_touches"),
        round(sum($"share").cast("double"), 4).as("attributed"))
      .orderBy($"user_id")
  }

  val multitouchOracle: String =
    """WITH touches AS (
      |  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id, p.value
      |  FROM events c JOIN events p
      |    ON p.user_id = c.user_id AND p.event_type = 'purchase'
      |   AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |  WHERE c.event_type = 'click'),
      |shares AS (
      |  SELECT user_id,
      |         CAST(value / (count(*) OVER (PARTITION BY purchase_id)) AS DECIMAL(28,8)) AS share
      |  FROM touches)
      |SELECT user_id,
      |       CAST(count(*) AS BIGINT) AS n_touches,
      |       CAST(round(CAST(sum(share) AS DOUBLE), 4) AS DOUBLE) AS attributed
      |FROM shares GROUP BY user_id ORDER BY user_id""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("asof_click_attribution", Some(asofOracle), asofClickAttribution),
    Q("ev_sessionize", Some(sessionizeOracle), sessionize),
    Q("ev_session_window_native", Some(sessionWindowOracle), sessionWindowNative),
    Q("range_join_purchases_1h", Some(rangeJoinOracle), rangeJoinPurchasesAfterView),
    Q("ev_multitouch_attribution", Some(multitouchOracle), multitouchAttribution))
}

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

  // ---------------------------------------------------------------------
  // Interval × interval overlap join (grid-bucketed)
  // ---------------------------------------------------------------------

  /** Generic interval×interval OVERLAP join — the case neither the as-of
    * window trick nor the point-in-interval bucket replication above can
    * express, because BOTH sides are genuine intervals and there is no
    * shared equi-key. A naive `a.join(b, overlap-predicate)` has no
    * extractable equi-condition, so Catalyst plans a nested loop —
    * quadratic, dead at scale.
    *
    * Construction: both sides explode each interval to the `gridSec`-wide
    * time cells it covers (`sequence(floor(start/g), floor(end/g))`), the
    * join runs on the cell as an equi-key with the exact closed-interval
    * overlap (`aStart <= bEnd && bStart <= aEnd`) as the hash-join
    * residual. A pair overlapping across k shared cells would match k
    * times; the first-overlapping-cell rule dedupes WITHOUT a distinct
    * shuffle: the overlap region starts at `greatest(aStart, bStart)`,
    * which lies inside both intervals whenever they overlap at all, so
    * requiring `cell == floor(greatest(starts)/g)` keeps exactly one of
    * the k matches. Cost is O(rows · len/gridSec) exploded rows and ONE
    * equi-join shuffle — pick `gridSec` near the median interval length
    * so the explode factor stays ~2 while cells keep join selectivity.
    *
    * Both input frames must have disjoint column names; outputs all of
    * `a`'s then all of `b`'s columns, one row per overlapping pair. */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          gridSec: Long): DataFrame = {
    def cells(df: DataFrame, st: String, en: String) =
      df.withColumn("__cell", explode(sequence(
        floor(unix_timestamp(col(st)) / gridSec).cast("long"),
        floor(unix_timestamp(col(en)) / gridSec).cast("long"))))
    val ae = cells(a, aStart, aEnd).alias("a")
    val be = cells(b, bStart, bEnd).alias("b")
    ae.join(be,
        col("a.__cell") === col("b.__cell") &&
          col(s"a.$aStart") <= col(s"b.$bEnd") &&
          col(s"b.$bStart") <= col(s"a.$aEnd") &&
          col("a.__cell") === floor(unix_timestamp(
            greatest(col(s"a.$aStart"), col(s"b.$bStart"))) / gridSec).cast("long"))
      .select(a.columns.map(c => col(s"a.$c")) ++
        b.columns.map(c => col(s"b.$c")): _*)
  }

  /** Incident-impact readout over the overlap join: error BURSTS (per-hour
    * span of 'error' events, hours with ≥3 errors) × user SESSIONS (the
    * 30-min-gap sessions of [[sessionize]]) — for each burst, how many
    * sessions/users were active while it ran and for how long in total.
    * This is the time-only overlap (no user key joins a burst to ALL
    * concurrent sessions), i.e. the genuinely keyless interval join.
    *
    * Determinism: overlap durations are summed as exact int64
    * MICROSECONDS (both engines compute `µs(least(ends)) −
    * µs(greatest(starts))` on identical µs timestamps), and only the
    * final sum divides to seconds — one identical double op per group,
    * no float summation-order seam. */
  def intervalOverlapImpact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val bursts = ev.filter($"event_type" === "error")
      .groupBy(date_trunc("hour", $"ts").as("bh"))
      .agg(min($"ts").as("b_start"), max($"ts").as("b_end"),
        count(lit(1)).as("n_errors"))
      .filter($"n_errors" >= 3)
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = ev
      .withColumn("brk",
        when(lag($"ts", 1).over(byUser).isNull ||
          $"ts" - lag($"ts", 1).over(byUser) > expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_no", sum($"brk").over(running))
      .groupBy($"user_id", $"session_no")
      .agg(min($"ts").as("s_start"), max($"ts").as("s_end"))
    intervalOverlapJoin(bursts, "b_start", "b_end",
        sessions, "s_start", "s_end", gridSec = 3600L)
      .withColumn("ov_us",
        unix_micros(least($"b_end", $"s_end")) -
          unix_micros(greatest($"b_start", $"s_start")))
      .groupBy($"bh")
      .agg(max($"n_errors").as("n_errors"),
        count(lit(1)).as("impacted_sessions"),
        countDistinct($"user_id").as("impacted_users"),
        (sum($"ov_us").cast("double") / lit(1000000.0)).as("overlap_sec"))
      .select(date_format($"bh", "yyyy-MM-dd HH").as("burst_hour"),
        $"n_errors", $"impacted_sessions", $"impacted_users", $"overlap_sec")
      .orderBy($"burst_hour")
  }

  val intervalOverlapOracle: String =
    """WITH bursts AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bh,
      |         min(CAST(ts AS TIMESTAMP)) AS b_start,
      |         max(CAST(ts AS TIMESTAMP)) AS b_end,
      |         count(*) AS n_errors
      |  FROM events WHERE event_type = 'error'
      |  GROUP BY 1 HAVING count(*) >= 3),
      |g AS (
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
      |  FROM g),
      |iv AS (
      |  SELECT user_id, session_no, min(uts) AS s_start, max(uts) AS s_end
      |  FROM sess GROUP BY user_id, session_no),
      |ov AS (
      |  SELECT b.bh, b.n_errors, s.user_id,
      |         epoch_us(least(b.b_end, s.s_end))
      |           - epoch_us(greatest(b.b_start, s.s_start)) AS ov_us
      |  FROM bursts b JOIN iv s
      |    ON b.b_start <= s.s_end AND s.s_start <= b.b_end)
      |SELECT strftime(bh, '%Y-%m-%d %H') AS burst_hour,
      |       CAST(max(n_errors) AS BIGINT) AS n_errors,
      |       CAST(count(*) AS BIGINT) AS impacted_sessions,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS impacted_users,
      |       CAST(CAST(sum(ov_us) AS BIGINT) AS DOUBLE) / 1000000.0 AS overlap_sec
      |FROM ov GROUP BY bh ORDER BY burst_hour""".stripMargin

  /** Within-window event dedup — the batch twin of Structured Streaming's
    * `dropDuplicatesWithinWatermark` (the standard defense against
    * at-least-once upstream retries: a producer that redelivers the same
    * logical event minutes later must not double-count it downstream).
    * Semantics here: within each clock hour, keep only the FIRST event
    * per (user_id, event_type) — ties on the µs timestamp broken by
    * event_id, so both engines pick the same survivor deterministically.
    * StreamingDedupSpec proves the streaming twin (state keyed the same
    * way, watermark-bounded) elects the same survivors on the same input
    * — an equivalence that holds when redeliveries ARRIVE after their
    * originals (the retry case this defends against):
    * `dropDuplicatesWithinWatermark` keeps the first-ARRIVED row per key,
    * while this batch formula keeps min(ts, event_id); the two diverge if
    * a duplicate arrives out of event-time order, where streaming keeps
    * the earlier-arrived, later-timestamped copy.
    *
    * Scale shape: one hash shuffle on (user, type, hour) + per-group sort
    * for `row_number` — the window key includes the hour bucket, so state
    * per group is the group's own rows, never a global sort; in streaming
    * form the same key bounds the state store, and the watermark expires
    * it. Output is the survivors' summary per hour (kept/dropped counts),
    * not the row dump, so the result stays grain-bounded at any SF. */
  def dedupEventWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window
      .partitionBy($"user_id", $"event_type", date_trunc("hour", $"ts"))
      .orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when($"rn" > 1, 1L).otherwise(0L)).as("n_dropped"))
      .orderBy($"hour")
  }

  val dedupEventWindowOracle: String =
    """WITH r AS (
      |  SELECT date_trunc('hour', ts) AS h,
      |         row_number() OVER (
      |           PARTITION BY user_id, event_type, date_trunc('hour', ts)
      |           ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT strftime(h, '%Y-%m-%d %H:00') AS hour,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      |FROM r GROUP BY h ORDER BY hour""".stripMargin

  /** Watermark-sizing advisor — the fourth readout→remedy audit (after
    * salt_plan / join_plan / compaction-adjacent census): how LATE does
    * event time run behind arrival order, and what watermark delay would
    * a streaming job need to not drop data? Lateness of an event is the
    * running maximum event time over everything that ARRIVED before it
    * (arrival order = the ingest sequence `event_id`) minus its own
    * event time; the report buckets the lateness distribution and maps
    * its 99% envelope to the smallest candidate `withWatermark` delay
    * covering it — every count integer-exact on both engines.
    *
    * The running max is the classic prefix scan a naive window would
    * compute in ONE task (`ORDER BY event_id` unpartitioned —
    * SinglePartition, the scale-killer): here it is the RankStats
    * two-level shape instead — range-bucket by arrival id, per-bucket
    * max → ≤buckets-row driver prefix fold broadcast back, per-bucket
    * running max in parallel, global = greatest(bucket prefix, local).
    * WatermarkPlanSpec plants out-of-order arrivals and checks the
    * buckets and the recommendation by hand; on the generated corpus
    * the producer emits in order (lateness 0 everywhere, recommendation
    * 0 s) — the spec's planted fixture is where the machinery is
    * exercised non-vacuously. */
  def watermarkPlan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"event_id", unix_micros($"ts").as("us"))
    val bounds = RankStats.rangeBounds(
      ev.select($"event_id".cast("double").as("v")), "v",
      RankStats.DefaultBuckets)
    val bucketed = ev.withColumn("__bucket",
      RankStats.bucketOf($"event_id".cast("double"), bounds))
    // per-bucket max event time → EXCLUSIVE running max over the bucket
    // order: a ≤buckets-row driver fold, broadcast back
    val maxes = bucketed.groupBy($"__bucket").agg(max($"us").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefixes = maxes.map(_._1)
      .zip(maxes.scanLeft(Long.MinValue)((acc, b) => math.max(acc, b._2))
        .init)
    val preDf = s.createDataFrame(prefixes.toSeq).toDF("__bucket", "__pre")
    val w = Window.partitionBy($"__bucket").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = bucketed.join(broadcast(preDf), Seq("__bucket"))
      .withColumn("runmax", greatest($"__pre", max($"us").over(w)))
      .withColumn("late_s", expr("(runmax - us) div 1000000"))
    late.agg(
        count(lit(1)).as("n_events"),
        sum(when($"late_s" <= 0, 1L).otherwise(0L)).as("n_on_time"),
        sum(when($"late_s" > 0 && $"late_s" <= 10, 1L).otherwise(0L)).as("n_late_le_10s"),
        sum(when($"late_s" > 10 && $"late_s" <= 60, 1L).otherwise(0L)).as("n_late_le_60s"),
        sum(when($"late_s" > 60, 1L).otherwise(0L)).as("n_late_gt_60s"),
        max($"late_s").as("max_late_s"),
        sum(when($"late_s" <= 0, 1L).otherwise(0L)).as("c0"),
        sum(when($"late_s" <= 1, 1L).otherwise(0L)).as("c1"),
        sum(when($"late_s" <= 5, 1L).otherwise(0L)).as("c5"),
        sum(when($"late_s" <= 10, 1L).otherwise(0L)).as("c10"),
        sum(when($"late_s" <= 30, 1L).otherwise(0L)).as("c30"),
        sum(when($"late_s" <= 60, 1L).otherwise(0L)).as("c60"),
        sum(when($"late_s" <= 300, 1L).otherwise(0L)).as("c300"))
      .select($"n_events", $"n_on_time", $"n_late_le_10s",
        $"n_late_le_60s", $"n_late_gt_60s", $"max_late_s",
        // smallest candidate delay covering >= 99% of arrivals — exact
        // integer comparison (c*100 vs 99*n), no float thresholds
        when($"c0" * 100 >= $"n_events" * 99, 0L)
          .when($"c1" * 100 >= $"n_events" * 99, 1L)
          .when($"c5" * 100 >= $"n_events" * 99, 5L)
          .when($"c10" * 100 >= $"n_events" * 99, 10L)
          .when($"c30" * 100 >= $"n_events" * 99, 30L)
          .when($"c60" * 100 >= $"n_events" * 99, 60L)
          .when($"c300" * 100 >= $"n_events" * 99, 300L)
          .otherwise($"max_late_s").as("recommended_watermark_s"))
  }

  val watermarkPlanOracle: String =
    """WITH o AS (
      |  SELECT epoch_us(ts) AS us,
      |         max(epoch_us(ts)) OVER (ORDER BY event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
      |  FROM events),
      |l AS (SELECT (runmax - us) // 1000000 AS late_s FROM o),
      |a AS (SELECT
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN late_s <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
      |  CAST(sum(CASE WHEN late_s > 0 AND late_s <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_le_10s,
      |  CAST(sum(CASE WHEN late_s > 10 AND late_s <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_le_60s,
      |  CAST(sum(CASE WHEN late_s > 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_gt_60s,
      |  CAST(max(late_s) AS BIGINT) AS max_late_s,
      |  CAST(sum(CASE WHEN late_s <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |  CAST(sum(CASE WHEN late_s <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |  CAST(sum(CASE WHEN late_s <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
      |  CAST(sum(CASE WHEN late_s <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS c10,
      |  CAST(sum(CASE WHEN late_s <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS c30,
      |  CAST(sum(CASE WHEN late_s <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS c60,
      |  CAST(sum(CASE WHEN late_s <= 300 THEN 1 ELSE 0 END) AS BIGINT) AS c300
      |FROM l)
      |SELECT n_events, n_on_time, n_late_le_10s, n_late_le_60s,
      |       n_late_gt_60s, max_late_s,
      |       CASE WHEN c0 * 100 >= n_events * 99 THEN 0
      |            WHEN c1 * 100 >= n_events * 99 THEN 1
      |            WHEN c5 * 100 >= n_events * 99 THEN 5
      |            WHEN c10 * 100 >= n_events * 99 THEN 10
      |            WHEN c30 * 100 >= n_events * 99 THEN 30
      |            WHEN c60 * 100 >= n_events * 99 THEN 60
      |            WHEN c300 * 100 >= n_events * 99 THEN 300
      |            ELSE max_late_s END AS recommended_watermark_s
      |FROM a""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("asof_click_attribution", Some(asofOracle), asofClickAttribution),
    Q("ev_watermark_plan", Some(watermarkPlanOracle), watermarkPlan),
    Q("dedup_event_window", Some(dedupEventWindowOracle), dedupEventWindow),
    Q("ev_sessionize", Some(sessionizeOracle), sessionize),
    Q("ev_session_window_native", Some(sessionWindowOracle), sessionWindowNative),
    Q("range_join_purchases_1h", Some(rangeJoinOracle), rangeJoinPurchasesAfterView),
    Q("ev_multitouch_attribution", Some(multitouchOracle), multitouchAttribution),
    Q("join_interval_overlap", Some(intervalOverlapOracle), intervalOverlapImpact))
}

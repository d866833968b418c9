package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series regularization: turn the irregular per-minute event stream
  * into a dense, gap-free grid with linearly interpolated values — the
  * resample step every metrics/feature pipeline runs before training a
  * forecaster or joining series of different densities.
  *
  * Nothing like this exists in the reference (its minute report simply
  * drops empty minutes, SURVEY.md §2 P6); this is the standard extension.
  *
  * Scale shape:
  *  - The observed side is the usual map-side-combinable minute
  *    aggregation (one shuffle keyed on (type, minute)).
  *  - The grid is |series| × |minutes-in-range| — generated, never
  *    shuffled from data. The cross join broadcasts the (tiny) distinct
  *    series keys against the generated minute spine.
  *  - Interpolation is two window passes (forward + backward) partitioned
  *    by the series key. At 100 TB you'd partition the window by
  *    (series, day) and stitch the day boundaries with a one-row-per-day
  *    exchange — the per-series sort here is the local[32]-scale version
  *    of that, and the partition key is the series, so no single global
  *    sort ever happens.
  */
object Timeseries {

  // One fixed day of the synthetic stream — a literal so both engines
  // generate the identical 1,440-minute spine per series.
  private val DayStart = "2024-01-05 00:00:00"
  private val DayEnd   = "2024-01-05 23:59:00"

  /** Dense per-(event_type, minute) series over one day with linear
    * interpolation across gaps. `v_filled` is:
    *   - the observed minute sum where the minute has events;
    *   - linear interpolation between the nearest observed neighbours
    *     (weighted by minute distance) inside a gap;
    *   - the nearest observed value at the open ends (no extrapolation);
    *   - null only if the series has no observations at all.
    *
    * The interpolation arithmetic is written with the same association
    * on both engines (`prev + (next-prev)*(t-tp)/(tn-tp)`) and rounded to
    * 4 dp, so cross-engine doubles cannot diverge. */
  def gapfillInterpolate(s: SparkSession, d: String): DataFrame =
    gapfillInterpolateOf(Tables.events(s, d), DayStart, DayEnd)

  /** The same regularization over any (event_type, ts, value) relation and
    * minute spine — spec entry point. */
  def gapfillInterpolateOf(ev: DataFrame, spineStart: String, spineEnd: String): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val obs = ev
      .filter($"ts" >= lit(spineStart).cast("timestamp") &&
        $"ts" < lit(spineEnd).cast("timestamp") + expr("interval 1 minute"))
      .groupBy($"event_type", date_trunc("minute", $"ts").as("minute"))
      .agg(sum($"value".cast("decimal(28,8)")).cast("double").as("v"))
    // The spine is exploded PER series key off the (aggregated, tiny)
    // distinct-series relation — a narrow Generate, not a cross join: the
    // grid never exists as a join of two relations, so nothing here can
    // ever degrade to a nested-loop plan (PlanHygieneSpec's invariant).
    val grid = ev.select($"event_type").distinct()
      .select($"event_type", explode(expr(
        s"sequence(timestamp'$spineStart', timestamp'$spineEnd', interval 1 minute)")).as("minute"))
    val fwd = Window.partitionBy($"event_type").orderBy($"minute")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy($"event_type").orderBy($"minute")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsMin = when($"v".isNotNull, $"minute")
    val j = grid.join(obs, Seq("event_type", "minute"), "left")
      .withColumn("pv", last($"v", ignoreNulls = true).over(fwd))
      .withColumn("pm", last(obsMin, ignoreNulls = true).over(fwd))
      .withColumn("nv", first($"v", ignoreNulls = true).over(bwd))
      .withColumn("nm", first(obsMin, ignoreNulls = true).over(bwd))
    val t  = unix_timestamp($"minute")
    val tp = unix_timestamp($"pm")
    val tn = unix_timestamp($"nm")
    val filled = when($"v".isNotNull, $"v")
      .when($"pv".isNull, $"nv")
      .when($"nv".isNull, $"pv")
      .otherwise($"pv" + ($"nv" - $"pv") * (t - tp) / (tn - tp))
    // Quantize through DECIMAL(28,8) before the 4-dp round: rounding a raw
    // double at 4 dp is engine-dependent exactly at half-boundaries (the
    // double 8.71375 rounds differently under Spark's BigDecimal HALF_UP
    // vs DuckDB's scaled-multiply — observed at sf0.01); both engines cast
    // the identical double to the identical 8-dp decimal, and decimal
    // rounding is exact HALF_UP on both.
    j.select(
        $"event_type", $"minute",
        round(filled.cast("decimal(28,8)"), 4).cast("double").as("v_filled"),
        $"v".isNotNull.as("observed"))
      .orderBy($"event_type", $"minute")
  }

  val gapfillInterpolateOracle: String =
    s"""WITH obs AS (
       |  SELECT event_type, date_trunc('minute', ts) AS minute,
       |         CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '$DayStart'
       |    AND ts < TIMESTAMP '$DayEnd' + INTERVAL 1 MINUTE
       |  GROUP BY 1, 2),
       |grid AS (
       |  SELECT t.event_type, g.minute
       |  FROM (SELECT DISTINCT event_type FROM events) t
       |  CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '$DayStart',
       |                   TIMESTAMP '$DayEnd', INTERVAL 1 MINUTE)) AS minute) g),
       |j AS (
       |  SELECT grid.event_type, grid.minute, obs.v,
       |    last_value(obs.v IGNORE NULLS) OVER w_fwd AS pv,
       |    last_value(CASE WHEN obs.v IS NOT NULL THEN grid.minute END IGNORE NULLS) OVER w_fwd AS pm,
       |    first_value(obs.v IGNORE NULLS) OVER w_bwd AS nv,
       |    first_value(CASE WHEN obs.v IS NOT NULL THEN grid.minute END IGNORE NULLS) OVER w_bwd AS nm
       |  FROM grid LEFT JOIN obs USING (event_type, minute)
       |  WINDOW
       |    w_fwd AS (PARTITION BY grid.event_type ORDER BY grid.minute
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    w_bwd AS (PARTITION BY grid.event_type ORDER BY grid.minute
       |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT event_type, minute,
       |  CAST(round(CAST(CASE WHEN v IS NOT NULL THEN v
       |                  WHEN pv IS NULL THEN nv
       |                  WHEN nv IS NULL THEN pv
       |                  ELSE pv + (nv - pv) * (epoch(minute) - epoch(pm))
       |                              / (epoch(nm) - epoch(pm)) END AS DECIMAL(28,8)), 4) AS DOUBLE) AS v_filled,
       |  (v IS NOT NULL) AS observed
       |FROM j ORDER BY event_type, minute""".stripMargin

  /** Exponentially-weighted moving average (α = 1/2) over the hourly
    * event-count series of each event type — the smoothing baseline every
    * rate-anomaly detector subtracts before thresholding (EWMA control
    * charts; Hunter 1986). `s_t = α·x_t + (1−α)·s_{t−1}`, `s_1 = x_1`,
    * unrolled to the closed form `s_t = Σ_i w(t,i)·x_i` with
    * `w(t,i) = 2^{−(t−i+1)}` (and the `2^{−(t−1)}` carry on `x_1`).
    *
    * α = 1/2 is chosen deliberately: every weight is an exact power of
    * two, so `x_i / 2^e` is ONE exact IEEE scaling (no rounding at all,
    * computed as a bigint shift on both engines) — the whole smoothing is
    * bit-deterministic cross-engine without any libm `pow` in sight; the
    * per-term DECIMAL quantize-then-sum idiom does the rest.
    *
    * Scale shape — why this is NOT an O(n²) self-join: weights vanish
    * below 2⁻⁶² within 62 lags, and a weight smaller than that quantizes
    * to an EXACT zero at 8 dp on both engines, so the join is BANDED to
    * the last 62 buckets per row (plus the `x_1` carry while t ≤ 63) —
    * constant work per output row, one shuffle keyed on the series.
    * Exponential forgetting IS the banding bound; no approximation is
    * introduced by it. */
  def ewmaHourly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    ewmaHourlyOf(Tables.events(s, d)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).cast("double").as("x")))
  }

  /** [[ewmaHourly]] on a prepared (event_type, hour, x) bucket table. */
  private[operators] def ewmaHourlyOf(hourly: DataFrame): DataFrame = {
    val s = hourly.sparkSession
    import s.implicits._
    val idx = hourly.select($"event_type", $"hour", $"x",
      row_number().over(
        Window.partitionBy($"event_type").orderBy($"hour")).as("t"))
    val a = idx.select($"event_type", $"hour", $"t", $"x".as("xt"))
    val b = idx.select($"event_type", $"t".as("i"), $"x".as("xi"))
    val e = when($"i" === 1, $"t" - 1).otherwise($"t" - $"i" + 1)
    a.join(b, Seq("event_type"))
      .where($"i" <= $"t" && e <= 62)
      .select($"event_type", $"hour", $"t", $"xt", $"xi", e.cast("int").as("e"))
      .select($"event_type", $"hour", $"t", $"xt",
        when($"e" === 0, $"xi")
          .otherwise(expr("xi / cast(shiftleft(cast(1 as bigint), e) as double)"))
          .cast("decimal(28,8)").as("term"))
      .groupBy($"event_type", $"hour", $"t", $"xt")
      // round the DECIMAL sum (exact HALF_UP), then widen — rounding
      // after the double cast is the half-boundary hazard
      .agg(round(sum($"term"), 4).cast("double").as("ewma"))
      .select($"event_type",
        date_format($"hour", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"t".cast("long").as("t"), $"xt".as("x"), $"ewma")
      .orderBy($"event_type", $"t")
  }

  val ewmaHourlyOracle: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |         CAST(count(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, hour, x,
      |         row_number() OVER (PARTITION BY event_type ORDER BY hour) AS t
      |  FROM hourly),
      |terms AS (
      |  SELECT a.event_type, a.hour, a.t, a.x AS xt,
      |         CAST(CASE WHEN (CASE WHEN b.t = 1 THEN a.t - 1
      |                              ELSE a.t - b.t + 1 END) = 0 THEN b.x
      |              ELSE b.x / CAST(CAST(1 AS BIGINT) <<
      |                     (CASE WHEN b.t = 1 THEN a.t - 1
      |                           ELSE a.t - b.t + 1 END) AS DOUBLE)
      |              END AS DECIMAL(28,8)) AS term
      |  FROM idx a JOIN idx b
      |    ON b.event_type = a.event_type AND b.t <= a.t
      |   AND (CASE WHEN b.t = 1 THEN a.t - 1 ELSE a.t - b.t + 1 END) <= 62)
      |SELECT event_type,
      |       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
      |       CAST(t AS BIGINT) AS t, xt AS x,
      |       CAST(round(sum(term), 4) AS DOUBLE) AS ewma
      |FROM terms
      |GROUP BY event_type, hour, t, xt
      |ORDER BY event_type, t""".stripMargin

  /** One-sided CUSUM change detection over the hourly series of each
    * event type — the classic sequential drift alarm (Page 1954; the
    * control-chart complement to [[ewmaHourly]]'s smoothing): with
    * per-type target μ and allowance k = σ/2,
    *
    *   S⁺_t = max(0, S⁺_{t−1} + x_t − (μ + k)),  alarm when S⁺_t > 4σ.
    *
    * A sustained upward rate shift accumulates where a single spike
    * decays — exactly the "error rate crept up 20% for six hours"
    * signal a threshold on raw x misses.
    *
    * Determinism: μ and σ come from exact decimal sums (the
    * [[TextOps.qualityZNorm]] idiom), and the
    * recursion applies the IDENTICAL IEEE op sequence on both engines —
    * Scala fold here, recursive CTE in DuckDB — `max(0, S + x − μk)`
    * term by term, so S is bit-identical cross-engine and the 4-dp round
    * can't diverge.
    *
    * Scale shape: the recursion is inherently sequential IN t but
    * independent ACROSS series — `flatMapGroups` after the group-by
    * shuffle runs one ordered fold per series key in parallel (the
    * sessionize pattern); state is one double per live series, and the
    * series table itself is horizon × key-cardinality — metadata-sized
    * regardless of corpus volume. */
  def cusumHourly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    cusumHourlyOf(Tables.events(s, d)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).cast("double").as("x")))
  }

  /** [[cusumHourly]] on a prepared (event_type, hour, x) bucket table. */
  private[operators] def cusumHourlyOf(hourly: DataFrame): DataFrame = {
    val s = hourly.sparkSession
    import s.implicits._
    val idx = hourly.select($"event_type", $"hour", $"x",
      row_number().over(
        Window.partitionBy($"event_type").orderBy($"hour")).as("t"))
    val stats = hourly.groupBy($"event_type").agg(
      sum($"x".cast("decimal(28,8)")).as("sx"),
      sum(($"x" * $"x").cast("decimal(28,8)")).as("sxx"),
      count(lit(1)).as("n"))
      .select($"event_type",
        ($"sx".cast("double") / $"n").as("mu"),
        sqrt(greatest(
          ($"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double") / $"n") / $"n",
          lit(0.0))).as("sigma"))
    val joined = idx.join(broadcast(stats), Seq("event_type"))
      .select($"event_type", $"t", $"x", $"mu", $"sigma")
      .as[(String, Int, Double, Double, Double)]
    joined.groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toSeq.sortBy(_._2)
        var sPos = 0.0
        rows.map { case (_, t, x, mu, sigma) =>
          // identical op order to the oracle's recursive CTE
          sPos = math.max(0.0, sPos + x - (mu + sigma / 2))
          (key, t, x, sPos, if (sPos > 4 * sigma) 1 else 0)
        }
      }
      .toDF("event_type", "t", "x", "cusum_raw", "alarm")
      .select($"event_type", $"t".cast("long").as("t"), $"x",
        // the gapfill decimal-quantize idiom: rounding a raw double at
        // 4 dp is engine-dependent exactly at half-boundaries
        round($"cusum_raw".cast("decimal(28,8)"), 4).cast("double").as("cusum_pos"),
        $"alarm")
      .orderBy($"event_type", $"t")
  }

  val cusumHourlyOracle: String =
    """WITH RECURSIVE hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |         CAST(count(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, x,
      |         row_number() OVER (PARTITION BY event_type ORDER BY hour) AS t
      |  FROM hourly),
      |stats AS (
      |  SELECT event_type,
      |         CAST(sum(CAST(x AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mu,
      |         sqrt(greatest(
      |           (CAST(sum(CAST(x * x AS DECIMAL(28,8))) AS DOUBLE)
      |            - CAST(sum(CAST(x AS DECIMAL(28,8))) AS DOUBLE)
      |              * CAST(sum(CAST(x AS DECIMAL(28,8))) AS DOUBLE) / count(*))
      |           / count(*), 0.0)) AS sigma
      |  FROM hourly GROUP BY event_type),
      |b AS (
      |  SELECT idx.event_type, idx.t, idx.x, stats.mu, stats.sigma
      |  FROM idx JOIN stats USING (event_type)),
      |c AS (
      |  SELECT event_type, t, x, mu, sigma,
      |         greatest(0.0, 0.0 + x - (mu + sigma / 2)) AS s
      |  FROM b WHERE t = 1
      |  UNION ALL
      |  SELECT b.event_type, b.t, b.x, b.mu, b.sigma,
      |         greatest(0.0, c.s + b.x - (b.mu + b.sigma / 2))
      |  FROM c JOIN b ON b.event_type = c.event_type AND b.t = c.t + 1)
      |SELECT event_type, CAST(t AS BIGINT) AS t, x,
      |       CAST(round(CAST(s AS DECIMAL(28,8)), 4) AS DOUBLE) AS cusum_pos,
      |       CAST(CASE WHEN s > 4 * sigma THEN 1 ELSE 0 END AS INT) AS alarm
      |FROM c
      |ORDER BY event_type, t""".stripMargin

  /** Holt's linear-trend (double exponential) smoothing over the hourly
    * series of each event type — the forecasting member of the
    * control-chart family ([[ewmaHourly]] smooths a LEVEL, this also
    * tracks its SLOPE, so a steadily-growing rate stops reading as a
    * permanent "above baseline" anomaly; Holt 1957). α = β = 1/2:
    *
    *   l_1 = x_1, b_1 = 0
    *   l_t = (x_t + (l_{t−1} + b_{t−1})) / 2
    *   b_t = ((l_t − l_{t−1}) + b_{t−1}) / 2
    *   one-step forecast  f_t = l_t + b_t
    *
    * Determinism: halving is an exact IEEE scaling (like EWMA's
    * power-of-two weights, no libm anywhere), and the Scala fold and the
    * oracle's recursive CTE apply the IDENTICAL op sequence — same
    * associativity, the duplicated l_t subexpression in SQL evaluating
    * bit-identically — so level/trend/forecast agree cross-engine before
    * the defensive 4-dp round.
    *
    * Scale shape: identical to [[cusumHourly]] — sequential in t,
    * parallel across series via one `flatMapGroups` fold; state is two
    * doubles per live series. */
  def holtTrendHourly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    holtTrendHourlyOf(Tables.events(s, d)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).cast("double").as("x")))
  }

  /** [[holtTrendHourly]] on a prepared (event_type, hour, x) bucket table. */
  private[operators] def holtTrendHourlyOf(hourly: DataFrame): DataFrame = {
    val s = hourly.sparkSession
    import s.implicits._
    val idx = hourly.select($"event_type", $"x",
      row_number().over(
        Window.partitionBy($"event_type").orderBy($"hour")).as("t"))
      .as[(String, Double, Int)]
    idx.groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toSeq.sortBy(_._3)
        var l = 0.0
        var b = 0.0
        var first = true
        rows.map { case (_, x, t) =>
          if (first) { l = x; b = 0.0; first = false }
          else {
            val lPrev = l
            // identical op order to the oracle's recursive CTE
            l = (x + (l + b)) / 2
            b = ((l - lPrev) + b) / 2
          }
          (key, t, x, l, b, l + b)
        }
      }
      .toDF("event_type", "t", "x", "l", "b", "f")
      .select($"event_type", $"t".cast("long").as("t"), $"x",
        // decimal-quantize before the 4-dp round (the gapfill idiom)
        round($"l".cast("decimal(28,8)"), 4).cast("double").as("level"),
        round($"b".cast("decimal(28,8)"), 4).cast("double").as("trend"),
        round($"f".cast("decimal(28,8)"), 4).cast("double").as("forecast"))
      .orderBy($"event_type", $"t")
  }

  val holtTrendOracle: String =
    """WITH RECURSIVE hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |         CAST(count(*) AS DOUBLE) AS x
      |  FROM hourly_src GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, x,
      |         row_number() OVER (PARTITION BY event_type ORDER BY hour) AS t
      |  FROM hourly),
      |c AS (
      |  SELECT event_type, t, x, x AS l, CAST(0.0 AS DOUBLE) AS b
      |  FROM idx WHERE t = 1
      |  UNION ALL
      |  SELECT i.event_type, i.t, i.x,
      |         (i.x + (c.l + c.b)) / 2,
      |         (((i.x + (c.l + c.b)) / 2 - c.l) + c.b) / 2
      |  FROM c JOIN idx i ON i.event_type = c.event_type AND i.t = c.t + 1)
      |SELECT event_type, CAST(t AS BIGINT) AS t, x,
      |       CAST(round(CAST(l AS DECIMAL(28,8)), 4) AS DOUBLE) AS level,
      |       CAST(round(CAST(b AS DECIMAL(28,8)), 4) AS DOUBLE) AS trend,
      |       CAST(round(CAST(l + b AS DECIMAL(28,8)), 4) AS DOUBLE) AS forecast
      |FROM c ORDER BY event_type, t""".stripMargin
      .replace("hourly_src", "events")

  // NOTE: defs last — it references the oracle vals above, and object
  // vals initialize in declaration order (a forward reference is null).
  /** Seasonal-naive decomposition of the hourly event series: per
    * (event_type, hour-of-day) the seasonal component is the mean count
    * over all days observed at that clock hour, and the residual is the
    * de-seasonalized signal an anomaly rule then thresholds (the
    * decomposition member of the control-chart family — EWMA smooths,
    * CUSUM alarms, Holt forecasts, this one strips the daily cycle
    * first). Everything stays EXACT: the seasonal mean is carried as the
    * (Σx, count) integer pair and the readouts are milli fixed point via
    * integer division (both engines truncate toward zero), so no float
    * ever enters.
    *
    * Scale shape: one hourly count aggregate (map-side combinable), one
    * (type × 24)-bounded seasonal aggregate, and a BROADCAST join of the
    * seasonal table back onto the hourly series — the series is horizon ×
    * key-cardinality, metadata-sized regardless of corpus volume. */
  def seasonalDecompose(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, d)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("x"))
      .withColumn("hod", hour($"hour").cast("long"))
    val seasonal = hourly.groupBy($"event_type", $"hod")
      .agg(sum($"x").as("ssum"), count(lit(1)).as("scnt"))
    hourly.join(broadcast(seasonal), Seq("event_type", "hod"))
      .select(
        $"event_type",
        date_format($"hour", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"hod", $"x", $"scnt",
        expr("(1000 * ssum) div scnt").as("seasonal_milli"),
        expr("(1000 * (x * scnt - ssum)) div scnt").as("resid_milli"))
      .orderBy($"event_type", $"hour")
  }

  /** The alerting readout over [[seasonalDecompose]]: hours whose count
    * deviates from their hour-of-day seasonal mean by ≥ 50% — the
    * "traffic for 3 AM is double its usual 3 AM level" rule, which a
    * raw-count threshold cannot express. Pure integer comparison
    * (2·|resid| ≥ seasonal in milli units — no division at all), so the
    * flag cannot flip between engines; same one-aggregate + broadcast
    * join shape as the decomposition. */
  def seasonalAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    seasonalDecompose(s, d)
      .where(abs($"resid_milli") * 2 >= $"seasonal_milli")
      .orderBy($"event_type", $"hour")
  }

  // resid_milli's numerator goes NEGATIVE (count below seasonal mean);
  // tdiv keeps the replay truncating under floor-`//` DuckDB builds too.
  val seasonalAnomalyOracle: String =
    s"""WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |hh AS (SELECT event_type, hour, x, CAST(hour(hour) AS BIGINT) AS hod
      |       FROM hourly),
      |seasonal AS (
      |  SELECT event_type, hod, CAST(sum(x) AS BIGINT) AS ssum,
      |         CAST(count(*) AS BIGINT) AS scnt
      |  FROM hh GROUP BY 1, 2),
      |dec AS (
      |  SELECT h.event_type,
      |         strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour,
      |         h.hod, h.x, s.scnt,
      |         (1000 * s.ssum) // s.scnt AS seasonal_milli,
      |         ${SqlIdioms.tdivSql("(1000 * (h.x * s.scnt - s.ssum))", "s.scnt")} AS resid_milli
      |  FROM hh h JOIN seasonal s USING (event_type, hod))
      |SELECT * FROM dec
      |WHERE abs(resid_milli) * 2 >= seasonal_milli
      |ORDER BY event_type, hour""".stripMargin

  val seasonalDecomposeOracle: String =
    s"""WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |hh AS (SELECT event_type, hour, x, CAST(hour(hour) AS BIGINT) AS hod
      |       FROM hourly),
      |seasonal AS (
      |  SELECT event_type, hod, CAST(sum(x) AS BIGINT) AS ssum,
      |         CAST(count(*) AS BIGINT) AS scnt
      |  FROM hh GROUP BY 1, 2)
      |SELECT h.event_type,
      |       strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour,
      |       h.hod, h.x, s.scnt,
      |       (1000 * s.ssum) // s.scnt AS seasonal_milli,
      |       ${SqlIdioms.tdivSql("(1000 * (h.x * s.scnt - s.ssum))", "s.scnt")} AS resid_milli
      |FROM hh h JOIN seasonal s USING (event_type, hod)
      |ORDER BY h.event_type, h.hour""".stripMargin

  /** LTTB-style visual downsampling (Steinarsson's Largest-Triangle-
    * Three-Buckets, the standard dashboard decimation): reduce each
    * event_type's (ts, value) series to ≤ [[LttbBuckets]] points that
    * preserve the series' visual shape — per time bucket, keep the point
    * forming the largest triangle with its neighbour buckets, so spikes
    * and inflections survive while flat runs collapse. The step a 100 TB
    * store runs before shipping a series to a chart: the renderer gets
    * ~50 points per series no matter how many billions back them.
    *
    * Variant note: canonical LTTB anchors each triangle on the PREVIOUSLY
    * SELECTED point — a sequential dependency that cannot parallelize.
    * This is the fixed-anchor (bucket-mean) variant: both anchors are the
    * neighbour buckets' mean points, so every bucket's argmax is
    * independent — one groupBy census, one tiny per-series window for the
    * anchors, one broadcast join back, one partitioned argmax window. The
    * first/last buckets keep the series' first/last point (canonical).
    * Empty buckets fall back to the nearest non-empty neighbour anchor
    * (lag/lead over existing buckets does this for free).
    *
    * Scale shape: the heavy relations see only ONE shuffle each — the
    * (type, bucket) mean census (map-side combinable) and the per-bucket
    * argmax window (partitioned by (type, bucket), never SinglePartition);
    * the anchor relation is |types|·|buckets| rows, broadcast. Cross-
    * engine determinism: bucket index and time offsets are exact int64
    * µs, bucket means divide identical operands in identical order, the
    * area is quantized to 6 dp before ranking, and ties break on
    * (t, event_id). */
  private val LttbBuckets = 48

  def lttbDownsample(s: SparkSession, d: String): DataFrame =
    lttbDownsampleOf(Tables.events(s, d), LttbBuckets)

  /** Shared decimation front end for LTTB and M4: null-filtered
    * (event_type, b, dt, t, v, id) points with the exact-int64 bucket
    * index over each series' own [mn, mx] µs span — the two decimators
    * must bucket IDENTICALLY or their oracles drift, so the formula
    * lives once. Columns a caller's aggregates never reference (M4 uses
    * neither dt nor id) are pruned by Catalyst, so sharing costs
    * nothing. */
  private def bucketedPoints(ev: DataFrame, nBuckets: Int): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val pts = ev.filter($"ts".isNotNull && $"value".isNotNull)
      .select($"event_type", unix_micros($"ts").as("t"), $"value".as("v"),
        $"event_id".as("id"))
    val rng = pts.groupBy($"event_type")
      .agg(min($"t").as("mn"), max($"t").as("mx"))
    pts.join(broadcast(rng), Seq("event_type"))
      .select($"event_type",
        expr(s"((t - mn) * CAST($nBuckets AS BIGINT)) div (mx - mn + 1)").as("b"),
        ($"t" - $"mn").as("dt"), $"t", $"v", $"id")
  }

  /** The downsampler over any (event_type, ts, value, event_id) relation —
    * spec entry point. */
  def lttbDownsampleOf(ev: DataFrame, nBuckets: Int): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val pb = bucketedPoints(ev, nBuckets)
    val avgs = pb.groupBy($"event_type", $"b")
      .agg(count(lit(1)).as("n_pts"), sum($"dt").as("sdt"),
        sum($"v".cast("decimal(28,8)")).as("sv"))
      .select($"event_type", $"b", $"n_pts",
        ($"sdt".cast("double") / $"n_pts".cast("double") / lit(1000000.0)).as("at"),
        ($"sv".cast("double") / $"n_pts".cast("double")).as("av"))
    val w = Window.partitionBy($"event_type").orderBy($"b")
    val anchors = avgs
      .withColumn("ax", lag($"at", 1).over(w))
      .withColumn("ay", lag($"av", 1).over(w))
      .withColumn("cx", lead($"at", 1).over(w))
      .withColumn("cy", lead($"av", 1).over(w))
      .withColumn("maxb", max($"b").over(Window.partitionBy($"event_type")))
    val dts = $"dt".cast("double") / lit(1000000.0)
    val areaQ = round(
      abs(($"ax" - $"cx") * ($"v" - $"ay") - ($"ax" - dts) * ($"cy" - $"ay"))
        .cast("decimal(28,6)"), 6).cast("double")
    val key1 = when($"b" === 0L, dts)
      .when($"b" === $"maxb", -dts)
      .otherwise(-coalesce(areaQ, lit(0.0)))
    val pick = Window.partitionBy($"event_type", $"b")
      .orderBy(key1.asc, $"t".asc, $"id".asc)
    pb.join(broadcast(anchors), Seq("event_type", "b"))
      .withColumn("rn", row_number().over(pick))
      .filter($"rn" === 1)
      .select($"event_type", $"b".as("bucket"), $"n_pts",
        $"t".as("sel_t_us"), $"v".as("sel_value"))
      .orderBy($"event_type", $"bucket")
  }

  val lttbDownsampleOracle: String =
    s"""WITH pts AS (
      |  SELECT event_type, epoch_us(ts) AS t, value AS v, event_id AS id
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      |rng AS (SELECT event_type, min(t) AS mn, max(t) AS mx FROM pts GROUP BY 1),
      |pb AS (
      |  SELECT p.event_type, ((p.t - r.mn) * $LttbBuckets) // (r.mx - r.mn + 1) AS b,
      |         p.t - r.mn AS dt, p.t, p.v, p.id
      |  FROM pts p JOIN rng r USING (event_type)),
      |avgs AS (
      |  SELECT event_type, b, CAST(count(*) AS BIGINT) AS n_pts,
      |         CAST(sum(dt) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS at,
      |         CAST(sum(CAST(v AS DECIMAL(28,8))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS av
      |  FROM pb GROUP BY 1, 2),
      |anch AS (
      |  SELECT event_type, b, n_pts,
      |         lag(at) OVER w AS ax, lag(av) OVER w AS ay,
      |         lead(at) OVER w AS cx, lead(av) OVER w AS cy,
      |         max(b) OVER (PARTITION BY event_type) AS maxb
      |  FROM avgs WINDOW w AS (PARTITION BY event_type ORDER BY b)),
      |scored AS (
      |  SELECT p.event_type, p.b, a.n_pts, p.t, p.v, p.id,
      |         CASE WHEN p.b = 0 THEN p.dt / 1000000.0
      |              WHEN p.b = a.maxb THEN -(p.dt / 1000000.0)
      |              ELSE -coalesce(CAST(round(CAST(abs(
      |                       (a.ax - a.cx) * (p.v - a.ay)
      |                       - (a.ax - p.dt / 1000000.0) * (a.cy - a.ay))
      |                     AS DECIMAL(28,6)), 6) AS DOUBLE), 0.0)
      |         END AS key1
      |  FROM pb p JOIN anch a USING (event_type, b)),
      |sel AS (
      |  SELECT event_type, b, n_pts, t, v,
      |         row_number() OVER (PARTITION BY event_type, b
      |                            ORDER BY key1 ASC, t ASC, id ASC) AS rn
      |  FROM scored)
      |SELECT event_type, b AS bucket, n_pts, t AS sel_t_us, v AS sel_value
      |FROM sel WHERE rn = 1
      |ORDER BY event_type, bucket""".stripMargin

  /** M4 downsampling (Jugel et al., VLDB'14): per (series, time bucket)
    * keep exactly the FOUR points a pixel-perfect line renderer needs —
    * first, last, min-value, max-value — deduplicated when one point
    * plays several roles. The companion to [[lttbDownsample]]: M4 is
    * error-free for line rendering at the bucket-per-pixel width, LTTB
    * is better-looking at aggressive ratios; a 100 TB store serves both
    * from the same bucket census.
    *
    * Scale shape: M4 decomposes — first/last/min/max are all struct
    * min/max (lexicographic), so the whole decimation is ONE map-side-
    * combinable aggregate per (type, bucket): no window, no sort, no
    * state beyond 4 structs × buckets per task. Same cell shape as
    * [[graft.streaming.Ingest.upsertM4Rollup]] — the batch and
    * streaming paths share their physics. (A first cut used four
    * row_number windows whose differing sort orders plan as four sorts:
    * 63 s at 100M points vs the aggregate's census-bound cost —
    * SCALE_NOTES Leg 26 has both.) Determinism: struct comparison
    * breaks value ties by time; two raw events tied on BOTH (t, v) are
    * indistinguishable in the output and their roles merge into one
    * row's bitmask — so the oracle hash is order-safe. */
  def m4Downsample(s: SparkSession, d: String): DataFrame =
    m4DownsampleOf(Tables.events(s, d), LttbBuckets)

  /** The ≤4-point role explode shared by the batch decimator and the
    * served rollup ([[graft.streaming.Ingest.servedM4]]): turns the four
    * extreme structs (first_s/last_s as (t, v); min_s/max_s as (v, t))
    * into (t, v, role-bit) points — one definition so the two serving
    * paths' bitmask shapes cannot drift. */
  private[graft] def m4RolesExploded: Column = explode(array(
    struct(col("first_s.t").as("t"), col("first_s.v").as("v"), lit(1).as("role")),
    struct(col("last_s.t").as("t"), col("last_s.v").as("v"), lit(2).as("role")),
    struct(col("min_s.t").as("t"), col("min_s.v").as("v"), lit(4).as("role")),
    struct(col("max_s.t").as("t"), col("max_s.v").as("v"), lit(8).as("role"))))

  def m4DownsampleOf(ev: DataFrame, nBuckets: Int): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val pb = bucketedPoints(ev, nBuckets)
    pb.groupBy($"event_type", $"b")
      .agg(min(struct($"t", $"v")).as("first_s"),
        max(struct($"t", $"v")).as("last_s"),
        min(struct($"v", $"t")).as("min_s"),
        max(struct($"v", $"t")).as("max_s"))
      .select($"event_type", $"b", m4RolesExploded.as("p"))
      .groupBy($"event_type", $"b".as("bucket"),
        $"p.t".as("sel_t_us"), $"p.v".as("sel_value"))
      .agg(sum($"p.role").cast("int").as("roles"))
      .orderBy($"event_type", $"bucket", $"sel_t_us", $"sel_value", $"roles")
  }

  val m4DownsampleOracle: String =
    s"""WITH pts AS (
      |  SELECT event_type, epoch_us(ts) AS t, value AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      |rng AS (SELECT event_type, min(t) AS mn, max(t) AS mx FROM pts GROUP BY 1),
      |pb AS (
      |  SELECT p.event_type, ((p.t - r.mn) * $LttbBuckets) // (r.mx - r.mn + 1) AS b,
      |         p.t, p.v
      |  FROM pts p JOIN rng r USING (event_type)),
      |m AS (
      |  SELECT event_type, b,
      |         min(struct_pack(t := t, v := v)) AS first_s,
      |         max(struct_pack(t := t, v := v)) AS last_s,
      |         min(struct_pack(v := v, t := t)) AS min_s,
      |         max(struct_pack(v := v, t := t)) AS max_s
      |  FROM pb GROUP BY 1, 2),
      |pts4 AS (
      |  SELECT event_type, b, (first_s).t AS t, (first_s).v AS v, 1 AS role FROM m
      |  UNION ALL SELECT event_type, b, (last_s).t, (last_s).v, 2 FROM m
      |  UNION ALL SELECT event_type, b, (min_s).t, (min_s).v, 4 FROM m
      |  UNION ALL SELECT event_type, b, (max_s).t, (max_s).v, 8 FROM m)
      |SELECT event_type, b AS bucket, t AS sel_t_us, v AS sel_value,
      |       CAST(sum(role) AS INTEGER) AS roles
      |FROM pts4 GROUP BY 1, 2, 3, 4
      |ORDER BY event_type, bucket, sel_t_us, sel_value, roles""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("ev_lttb_downsample", Some(lttbDownsampleOracle), lttbDownsample),
    Q("ev_m4_downsample", Some(m4DownsampleOracle), m4Downsample),
    Q("ev_gapfill_interpolate", Some(gapfillInterpolateOracle), gapfillInterpolate),
    Q("ev_ewma_hourly", Some(ewmaHourlyOracle), ewmaHourly),
    Q("ev_cusum_hourly", Some(cusumHourlyOracle), cusumHourly),
    Q("ev_holt_trend", Some(holtTrendOracle), holtTrendHourly),
    Q("ev_seasonal_decompose", Some(seasonalDecomposeOracle), seasonalDecompose),
    Q("ev_seasonal_anomaly", Some(seasonalAnomalyOracle), seasonalAnomaly))

}

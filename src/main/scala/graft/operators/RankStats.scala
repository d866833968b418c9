package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order statistics WITHOUT a single-partition sort.
  *
  * `rank()/percent_rank()/cume_dist()/ntile()` over an unpartitioned
  * `ORDER BY` compile to `Exchange SinglePartition` + one task sorting the
  * whole table — the classic scale-killer (fine at sf0.1, fatal at 100 TB).
  * This helper computes the same statistics with the two-level pattern a
  * distributed engine wants:
  *
  *  1. bucket rows by range over the order value — boundaries come from
  *     `approxQuantile` (driver receives ~32 doubles, never data). Strict
  *     `>` comparisons guarantee ALL rows with an equal order value land in
  *     the same bucket, which makes per-bucket tie counts globally correct;
  *  2. per-bucket row counts → cumulative offsets (a ~32-row driver
  *     aggregate, broadcast back as a join);
  *  3. per-bucket window functions (each bucket sorts in parallel) plus the
  *     broadcast offset reconstruct the GLOBAL rank / row number exactly.
  *
  * The result plan has one hash shuffle on the bucket id, a broadcast
  * join, and parallel per-bucket sorts — no single-partition exchange.
  */
object RankStats {

  /** Default bucket count: enough parallelism for a local sweep; at real
    * cluster scale callers pass ~2-4× the executor-core count. */
  val DefaultBuckets = 32

  /** Attaches global order statistics for `valueCol` (ascending order) to
    * `df`:
    *  - `__lt`: number of rows with a strictly smaller value (= rank-1),
    *  - `__le`: number of rows with a smaller-or-equal value,
    *  - `__n`:  total row count.
    * `percent_rank = __lt/(__n-1)`, `cume_dist = __le/__n`.
    *
    * `tieCols` break ties for the per-bucket row-number path (used by
    * [[withGlobalRowNumber]]); they do not affect `__lt`/`__le`.
    */
  def withRankCounts(df: DataFrame, valueCol: String,
                     buckets: Int = DefaultBuckets): DataFrame = {
    val s = df.sparkSession
    val n = df.count()
    val bounds = rangeBounds(df, valueCol, buckets)
    val bucketed = df.withColumn("__bucket", bucketOf(col(valueCol), bounds))
    val offsets = bucketOffsets(bucketed)
    val w = Window.partitionBy(col("__bucket")).orderBy(col(valueCol))
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__lt", col("__off") + rank().over(w) - 1)
      .withColumn("__le", col("__off") +
        count(lit(1)).over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", lit(n))
      .drop("__bucket", "__off")
  }

  /** Attaches the global 1-based row number `__rn` for the total order
    * (`valueCol` in `asc`/desc order, then `tieCols` ascending), plus
    * `__n`. Same two-level pattern; the order must be total (tie columns
    * must pin every row) for the result to be deterministic. */
  def withGlobalRowNumber(df: DataFrame, valueCol: String, asc: Boolean,
                          tieCols: Seq[String],
                          buckets: Int = DefaultBuckets): DataFrame = {
    val n = df.count()
    val bounds = rangeBounds(df, valueCol, buckets)
    // For DESC order the highest values must land in bucket 0: count the
    // boundaries ABOVE the value instead of below. Equal values still share
    // a bucket (strict comparisons), so per-bucket ordering is exact.
    val bucketed = df.withColumn("__bucket",
      if (asc) bucketOf(col(valueCol), bounds)
      else bounds.foldLeft(lit(0))((acc, b) =>
        acc + when(col(valueCol) < lit(b), 1).otherwise(0)))
    val offsets = bucketOffsets(bucketed)
    val order = (if (asc) col(valueCol).asc else col(valueCol).desc) +:
      tieCols.map(col(_).asc)
    val w = Window.partitionBy(col("__bucket")).orderBy(order: _*)
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__rn", col("__off") + row_number().over(w))
      .withColumn("__n", lit(n))
      .drop("__bucket", "__off")
  }

  /** SQL-standard NTILE(k) from a global row number: the first `n mod k`
    * tiles get `ceil(n/k)` rows, the rest `floor(n/k)`. Pure expression —
    * pair with [[withGlobalRowNumber]]. */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    val q = (n / k).cast("long")          // floor tile size
    val rem = n % k                        // tiles that get one extra row
    val bigSpan = rem * (q + 1)            // rows covered by the big tiles
    when(rn <= bigSpan, ((rn - 1) / (q + 1)).cast("long") + 1)
      .otherwise(rem + ((rn - bigSpan - 1) / q).cast("long") + 1)
  }

  /** ~`buckets` range boundaries from approxQuantile — a bounded driver
    * action (the only driver data is the boundary doubles themselves). */
  private[operators] def rangeBounds(df: DataFrame, valueCol: String, buckets: Int): Seq[Double] =
    df.stat.approxQuantile(valueCol,
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .distinct.sorted.toSeq

  /** Strict-`>` range bucketing: equal values always share a bucket. */
  private[operators] def bucketOf(v: Column, bounds: Seq[Double]): Column =
    bounds.foldLeft(lit(0))((acc, b) => acc + when(v > lit(b), 1).otherwise(0))

  /** Per-bucket counts → exclusive cumulative offsets. The aggregate is at
    * most `buckets` rows — a bounded collect, broadcast back. */
  private[operators] def bucketOffsets(bucketed: DataFrame): DataFrame = {
    val s = bucketed.sparkSession
    import s.implicits._
    val counts = bucketed.groupBy($"__bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offs = counts.scanLeft(0L)(_ + _._2).init
    s.createDataFrame(counts.map(_._1).zip(offs).toSeq).toDF("__bucket", "__off")
  }
}

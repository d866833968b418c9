package graft.reference

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's canonical event model (SURVEY.md §1, FIXTURES.md §1):
  * the 9-column `user_interactions` row and a seeded, fully distributed
  * generator reproducing the producer's distributions
  * (reference producer/producer.py:23-51, producer/config.py:26-27).
  *
  * The generator is column-expression based (`rand(seed)`, no driver loop,
  * no UDF): generating 10^12 rows is one `spark.range(n)` with narrow maps.
  */
object Events {

  val EventTypes = Seq("VIEW_PRODUCT", "ADD_TO_CART", "CHECKOUT", "PAYMENT", "SEARCH")
  val ProductEventTypes = Seq("VIEW_PRODUCT", "ADD_TO_CART")

  /** Explicit schema — the reference never infers schemas (SURVEY.md §1.2). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("session_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("event_timestamp", TimestampType, nullable = false),
    StructField("request_latency_ms", IntegerType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("error_code", IntegerType, nullable = true),
    StructField("product_id", IntegerType, nullable = true)))

  /** Deterministic uuid4-shaped id from a long + salt (reference uses
    * uuid.uuid4(), producer.py:38-40; ours must be seed-reproducible). */
  private def uuidCol(src: Column, salt: String): Column = {
    val h = md5(concat(src.cast("string"), lit(salt)))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Seeded event batch: n rows starting at `startEpochMillis`, spaced
    * `intervalMs` apart (reference rate ≈100 ev/s → intervalMs=10).
    *
    * Distribution rules (producer.py:33-50, verified by its unit tests):
    *  - event_type uniform over the 5 values;
    *  - status ERROR with probability `errorProb` (reference draws the prob
    *    itself from U(0, 0.5) per run — pass that draw in);
    *  - error_code uniform 400..599 iff ERROR, else null;
    *  - product_id uniform 1..10000 iff event_type ∈ {VIEW_PRODUCT,
    *    ADD_TO_CART}, else null;
    *  - request_latency_ms uniform 50..1500;
    *  - user/session rotate with ~1% probability per event
    *    (producer.py:118-120) — modeled as a running bucket id.
    */
  def generate(
      spark: SparkSession,
      n: Long,
      startEpochMillis: Long,
      intervalMs: Long = 10L,
      errorProb: Double = 0.25,
      seed: Long = 42L): DataFrame =
    // partition sizing clamped before toInt: a plain (n/100000).toInt
    // overflows to a negative for n beyond ~2.1e14 and would collapse the
    // generator into one partition; cap at 100k partitions instead
    fromIds(spark.range(0, n, 1,
        math.max(1L, math.min(100000L, n / 100000L)).toInt).toDF("id"),
      startEpochMillis, intervalMs, errorProb, seed)

  /** Map a DataFrame with a long `id` column to event rows — shared by the
    * batch generator (`spark.range`) and the streaming generator (rate
    * source, streaming/Ingest.scala). */
  def fromIds(
      base: DataFrame,
      startEpochMillis: Long,
      intervalMs: Long = 10L,
      errorProb: Double = 0.25,
      seed: Long = 42L): DataFrame = {
    // 1% rotation (producer.py:118-120): a running count over all prior rows
    // would be a global shuffle at scale; a deterministic per-100-row bucket
    // + hash-rotation preserves the "~1% of events start a new user/session"
    // marginal distribution while staying a narrow map.
    base
      .withColumn("rot", when(rand(seed + 1) < 0.01, 1L).otherwise(0L))
      .withColumn("bucket", floor(col("id") / 100) + col("rot"))
      .select(
        // event ids are salted with (seed, start): the reference draws a
        // fresh uuid4 per event (producer.py:38), so two generated batches
        // must never collide — while identical parameters stay reproducible.
        // user/session ids deliberately do NOT carry the salt: the same
        // simulated users persist across batches/minutes.
        uuidCol(col("id"), s"evt-$seed-$startEpochMillis").as("event_id"),
        uuidCol(col("bucket"), "usr").as("user_id"),
        uuidCol(col("bucket"), "ses").as("session_id"),
        element_at(
          typedlit(EventTypes),
          (floor(rand(seed + 2) * EventTypes.size) + 1).cast("int")).as("event_type"),
        timestamp_millis(lit(startEpochMillis) + col("id") * intervalMs).as("event_timestamp"),
        (lit(50) + floor(rand(seed + 3) * 1451)).cast("int").as("request_latency_ms"),
        when(rand(seed + 4) < errorProb, "ERROR").otherwise("SUCCESS").as("status"))
      .withColumn("error_code",
        when(col("status") === "ERROR",
          (lit(400) + floor(rand(seed + 5) * 200)).cast("int")).otherwise(lit(null)))
      .withColumn("product_id",
        when(col("event_type").isin(ProductEventTypes: _*),
          (lit(1) + floor(rand(seed + 6) * 10000)).cast("int")).otherwise(lit(null)))
  }

  /** Derived warehouse partition key (reference db sql:15: MATERIALIZED
    * toStartOfMinute). */
  def withEventMinute(df: DataFrame): DataFrame =
    df.withColumn("event_minute", date_trunc("minute", col("event_timestamp")))
}

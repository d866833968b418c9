package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Central catalog of the driver-provided tables (TESTDATA.md / FIXTURES.md §3).
  *
  * Every schema is explicit — the reference never infers a schema anywhere
  * (see SURVEY.md §1.2, reference airflow/dags/pipeline.py:30-33), and explicit
  * `StructType`s also pin Spark's parquet timestamp handling (LTZ, session TZ
  * UTC) so results line up with the DuckDB oracle.
  *
  * Scale posture: each loader is a plain parquet scan, so Catalyst column
  * pruning + predicate pushdown reach the file reader (verify with
  * `.explain("formatted")` → `ReadSchema`/`PushedFilters`). At 100 TB these
  * become multi-file partitioned scans with identical code.
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType, nullable = false),
    StructField("r_name", StringType, nullable = false)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType, nullable = false),
    StructField("n_name", StringType, nullable = false),
    StructField("n_regionkey", IntegerType, nullable = false)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType, nullable = false),
    StructField("c_name", StringType, nullable = false),
    StructField("c_nationkey", IntegerType, nullable = false),
    StructField("c_acctbal", DoubleType, nullable = false),
    StructField("c_mktsegment", StringType, nullable = false)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType, nullable = false),
    StructField("s_name", StringType, nullable = false),
    StructField("s_nationkey", IntegerType, nullable = false),
    StructField("s_acctbal", DoubleType, nullable = false)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType, nullable = false),
    StructField("p_name", StringType, nullable = false),
    StructField("p_brand", StringType, nullable = false),
    StructField("p_type", StringType, nullable = false),
    StructField("p_size", IntegerType, nullable = false),
    StructField("p_retailprice", DoubleType, nullable = false)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_custkey", LongType, nullable = false),
    StructField("o_orderstatus", StringType, nullable = false),
    StructField("o_totalprice", DoubleType, nullable = false),
    StructField("o_orderdate", TimestampType, nullable = false),
    StructField("o_orderpriority", StringType, nullable = false)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType, nullable = false),
    StructField("l_partkey", LongType, nullable = false),
    StructField("l_suppkey", LongType, nullable = false),
    StructField("l_linenumber", IntegerType, nullable = false),
    StructField("l_quantity", DoubleType, nullable = false),
    StructField("l_extendedprice", DoubleType, nullable = false),
    StructField("l_discount", DoubleType, nullable = false),
    StructField("l_tax", DoubleType, nullable = false),
    StructField("l_returnflag", StringType, nullable = false),
    StructField("l_linestatus", StringType, nullable = false),
    StructField("l_shipdate", TimestampType, nullable = false)))

  // ts is physically INT64 — TIMESTAMP(NANOS) in some generator versions
  // (Spark has no nanosecond timestamp type, so it is read as a long via
  // nanosAsLong), TIMESTAMP(MICROS) in others. It is read as a long either
  // way and normalized to a microsecond TimestampType in `events()` by
  // integer arithmetic (a double division would lose precision: 2024
  // epoch-nanos exceed 2^53). Unit detection is per-VALUE, not per-file:
  // 2024-era epoch-nanos are ~1.7e18, epoch-micros ~1.7e15 — anything
  // above 1e17 (year 5138 in micros) must be nanos.
  val eventsSchema = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = false),
    StructField("label", IntegerType, nullable = false)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema,
    "nation" -> nationSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema,
    "events" -> eventsSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // Every operator loads through here — the natural hook to make graft's
    // native functions (e.g. graft_dot) available in the session. Idempotent.
    graft.functions.GraftFunctions.register(spark)
    spark.read.schema(schemas(table)).parquet(s"$sfDir/$table.parquet")
  }

  /** Widen an under-parallel scan before HEAVY per-row work (guide §2.5:
    * "one huge unsplittable file … repartition immediately after the
    * read"). The sf parquet inputs are single-row-group files, so a scan
    * yields ONE task however many cores the session has — every
    * expensive narrow pipeline (shingling, per-token hashing, codec
    * decode) was single-threaded until its first exchange (measured:
    * featuresOf spent 3.0 s in one task at sf0.1 on 32 cores).
    *
    * Conditional, so the scale posture is unchanged: when the scan
    * already carries at least the session's default parallelism (any
    * real multi-file/multi-row-group table — a 100 TB table has
    * thousands of splits), this is the identity and no shuffle is
    * added. Round-robin repartition keeps Spark's sort-before-
    * repartition retry determinism; callers must only use it where
    * downstream math is partition-order-insensitive (exact integer /
    * per-row / hash work — NOT float means like kmeansCentroids). */
  def widened(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batches parallelize per trigger
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Size-estimate gate, NOT df.rdd.getNumPartitions: the .rdd probe
    // physically plans the frame a second time per call (measurable on
    // sub-second queries). The optimizer's sizeInBytes for a file scan
    // is the listed file size — a tiny input (< 4 MB/core: the regime
    // where a one-row-group file starves the session) widens; any real
    // table skips the extra shuffle entirely.
    val tiny = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes <
        BigInt(target) * 4L * 1024 * 1024).getOrElse(false)
    if (tiny) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr(
          "if(ts > 100000000000000000, ts div 1000, ts)")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.reference.Events

/** The engine's warehouse layer (SURVEY.md §7.2 M2) — the Spark-native
  * replacement for the reference's ClickHouse MergeTree table
  * (reference db/clickhouse_table_schema.sql:15-20):
  *
  *  - `partitionBy("event_minute")` ≙ MergeTree PARTITION BY toStartOfMinute
  *    → minute queries become metadata-only partition prunes
  *    (ARCHITECTURE.md:30 calls this out as the reference's key optimization);
  *  - `sortWithinPartitions(event_type, event_timestamp)` ≙ MergeTree
  *    ORDER BY (event_minute, event_type) — gives parquet row-group min/max
  *    statistics the same skip power as the MergeTree primary index;
  *  - JSON report sink ≙ the reference's MinIO report object
  *    (reference airflow/dags/spark.py:92-97); written through Spark so the
  *    same code targets s3a:// at scale.
  */
object Warehouse {

  /** Write events into the minute-partitioned warehouse. One shuffle on the
    * partition key (repartition before partitionBy keeps it to one file per
    * minute instead of files × tasks — at 100 TB adjust to
    * `repartition(n, col)` for multiple writers per hot minute). */
  def writeEvents(events: DataFrame, path: String, mode: String = "overwrite"): Unit =
    Events.withEventMinute(events)
      .repartition(col("event_minute"))
      // The sort must LEAD with the partition column: the dynamic-partition
      // writer requires ordering by partition columns and would otherwise
      // insert its own (non-stable) sort on event_minute, destroying the
      // secondary (event_type, event_timestamp) clustering.
      .sortWithinPartitions(col("event_minute"), col("event_type"), col("event_timestamp"))
      .write.mode(mode).partitionBy("event_minute").parquet(path)

  /** Minute-pruned read: the filter binds to the partition column, so the
    * scan touches exactly one partition directory. */
  def readMinute(spark: SparkSession, path: String, minute: java.sql.Timestamp): DataFrame =
    spark.read.parquet(path).filter(col("event_minute") === lit(minute))

  /** Single-object JSON report sink (S4). Spark write → works unchanged
    * against object stores; coalesce(1) mimics the reference's one report
    * object per minute. */
  def writeReportJson(spark: SparkSession, json: String, dir: String): Unit = {
    import spark.implicits._
    Seq(json).toDF("value").coalesce(1).write.mode("overwrite").text(dir)
  }

  /** Read back a JSON report written by [[writeReportJson]]. */
  def readReportJson(spark: SparkSession, dir: String): String =
    spark.read.text(dir).collect().map(_.getString(0)).mkString("\n")
}

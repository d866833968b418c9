package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic external-DBMS source — the half of the reference's S2 row the
  * parquet warehouse doesn't cover: the reference's extract step reads the
  * previous minute's rows out of a live DBMS over the wire
  * (airflow/dags/pipeline.py:135-155, a ClickHouse SELECT through a
  * database driver). The Spark-native form is the JDBC source, which
  * pushes predicates and the column projection into the remote SQL — the
  * external database does the filtering, only matching rows cross the
  * wire (JdbcSpec asserts `PushedFilters` on an in-process Derby).
  *
  * Scale posture: a single-connection JDBC read is one task no matter how
  * big the table — [[readTablePartitioned]] is the form a real extraction
  * uses: N concurrent connections, each reading one slice of a numeric
  * key range, giving an N-way parallel scan (and N× the load on the
  * source DBMS, which is the real-world ceiling; the reference bounds it
  * the same way by extracting one minute at a time).
  */
object Jdbc {

  /** Single-partition read of `table` (or a `(subquery) alias`). */
  def readTable(
      spark: SparkSession,
      url: String,
      table: String,
      driver: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .load()

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning one stride of `partitionColumn` ∈
    * [lowerBound, upperBound]. Bounds don't filter — rows outside land in
    * the first/last stride — they only shape the parallelism. */
  def readTablePartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      driver: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}

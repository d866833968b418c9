package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Corrupt-record policy for semi-structured sources. The reference runs
  * `errors.tolerance: none` on its Connect sink (fail-fast — AvroWire.decode
  * mirrors that); a 100 TB backfill over historical JSON wants the graceful
  * twin instead: parse what parses, QUARANTINE what doesn't, and never
  * silently drop either. PERMISSIVE + `_corrupt_record` gives exactly that
  * split in one scan — the corrupt rows stay queryable for a dead-letter
  * audit instead of killing a multi-hour job at row 40 billion. */
object Resilient {

  val CorruptCol = "_corrupt_record"

  /** Read line-delimited JSON: well-formed rows parse into `schema`,
    * malformed lines land whole in [[CorruptCol]] (null otherwise). */
  def readJsonPermissive(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** The strict twin: any malformed line fails the read (the reference's
    * `errors.tolerance: none`). */
  def readJsonFailFast(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Split a permissive read into (clean rows, dead letters). The parsed
    * scan is cached first: Spark disallows queries whose pruned columns
    * are ONLY the corrupt-record column on a raw JSON scan
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the two sides share one
    * parse this way instead of scanning twice. Callers unpersist after
    * materializing both sides. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    (parsed.filter(parsed(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(parsed(CorruptCol).isNotNull).select(CorruptCol))
  }
}

package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** File-level contract of dynamic partition overwrite (the query-level
  * roundtrip is oracle-gated as wh_partition_overwrite): only the
  * backfilled partition's files are rewritten; sibling partitions keep
  * the IDENTICAL physical files.
  */
class PartitionOverwriteSpec extends SparkSuite {

  private def listFiles(dir: String): Map[String, Set[String]] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet"))
      .groupBy(_.getParentFile.getName)
      .map { case (part, fs) =>
        part -> fs.map(f => s"${f.getName}:${f.length}:${f.lastModified}").toSet
      }
  }

  test("dynamic overwrite replaces only the targeted partition's files") {
    val dir = tmpDir("pow-files")
    val orders = graft.Tables.orders(spark, Sf)
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val before = listFiles(dir)
    assert(before.keySet === Set("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try orders.where(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0d))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = listFiles(dir)
    // untouched partitions: byte-identical file sets (name, size, mtime)
    assert(after("o_orderstatus=O") === before("o_orderstatus=O"))
    assert(after("o_orderstatus=P") === before("o_orderstatus=P"))
    // the backfilled partition was actually rewritten
    assert(after("o_orderstatus=F") !== before("o_orderstatus=F"))
    // and the data round-trips: F adjusted, O/P untouched, counts stable
    val got = spark.read.parquet(dir)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = orders.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}

package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The file-skipping manifest must (a) describe every file, (b) actually
  * skip files for a selective box on the z-ordered layout, (c) never
  * change answers — pruned result ≡ full-scan result, and (d) degrade to
  * a schema-correct empty relation when nothing overlaps. */
class ManifestSpec extends SparkSuite {

  private lazy val zDir = Manifest.zorderedLineitemDir(spark, Sf)

  test("manifest has one row per data file, with consistent totals") {
    val m = spark.read.parquet(Manifest.manifestDir(spark, zDir,
      Seq("l_partkey", "l_suppkey")))
    val nFiles = new java.io.File(zDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(m.count() == nFiles, s"manifest rows ${m.count()} != files $nFiles")
    val totalRows = m.agg(sum("n_rows")).head().getLong(0)
    assert(totalRows == spark.read.parquet(zDir).count())
  }

  test("2-D box on the z-ordered layout skips most files; answers unchanged") {
    val (p1, p2, s1, s2) = Manifest.boxBounds(spark, Sf)
    val ranges = Seq(
      ("l_partkey", p1.toDouble, p2.toDouble),
      ("l_suppkey", s1.toDouble, s2.toDouble))
    val (files, total) = Manifest.selectFiles(spark, zDir, ranges)
    info(s"selected ${files.size} of $total files")
    assert(total >= 8, s"expected a multi-file layout, got $total")
    assert(files.nonEmpty && files.size <= total / 2,
      s"box should skip at least half the z-ordered files: ${files.size}/$total")

    val pruned = Manifest.prunedScan(spark, zDir, ranges)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("px"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val full = spark.read.parquet(zDir)
      .filter(col("l_partkey").between(p1, p2) && col("l_suppkey").between(s1, s2))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("px"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(pruned.sameElements(full), "pruned scan changed the answer")
  }

  test("zero-overlap predicate selects zero files and returns empty, schema intact") {
    val ranges = Seq(("l_partkey", -100.0, -1.0))
    val (files, _) = Manifest.selectFiles(spark, zDir, ranges)
    assert(files.isEmpty)
    val df = Manifest.prunedScan(spark, zDir, ranges)
    assert(df.columns.contains("l_returnflag") && df.count() == 0)
  }
}

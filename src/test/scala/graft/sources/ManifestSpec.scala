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

  test("refresh stats only appended files and drops vanished ones") {
    import spark.implicits._
    val dir = tmpDir("manifest-refresh")
    val cols = Seq("k")
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.mode("overwrite").parquet(dir)
    Manifest.manifestDir(spark, dir, cols)
    assert(Manifest.refreshManifest(spark, dir, cols) == (0L, 0L),
      "unchanged dir must be a no-op")

    // append: only the new files get statted
    (101 to 140).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(2).write.mode("append").parquet(dir)
    val (added, dropped) = Manifest.refreshManifest(spark, dir, cols)
    assert(added == 2 && dropped == 0L, s"got ($added, $dropped)")
    val m = spark.read.parquet(Manifest.manifestDir(spark, dir, cols))
    assert(m.agg(sum("n_rows")).head().getLong(0) == 140)
    // the refreshed manifest still prunes correctly
    val (files, total) = Manifest.selectFiles(spark, dir, Seq(("k", 101.0, 140.0)))
    assert(files.nonEmpty && files.size < total,
      s"append-only range should not need all $total files")

    // compaction: old entries dropped, new file statted, totals intact
    val all = spark.read.parquet(dir).localCheckpoint()
    new java.io.File(dir).listFiles().foreach(f => if (!f.getName.startsWith("_")) {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
      }
      rm(f)
    })
    all.coalesce(1).write.mode("append").parquet(dir)
    val (a2, d2) = Manifest.refreshManifest(spark, dir, cols)
    assert(a2 == 1L && d2 >= 6L, s"got ($a2, $d2)")
    val m2 = spark.read.parquet(Manifest.manifestDir(spark, dir, cols))
    assert(m2.count() >= 1 && m2.agg(sum("n_rows")).head().getLong(0) == 140)
  }

  test("durable refresh re-homes to the appended source's address; later session serves") {
    import spark.implicits._
    val root = tmpDir("manifest-durable-root")
    val dir = tmpDir("manifest-durable-data")
    val cols = Seq("k")
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.mode("overwrite").parquet(dir)
    val a = spark.newSession()
    a.conf.set("spark.graft.artifact.root", root)
    val d1 = Manifest.manifestDir(a, dir, cols)
    (101 to 140).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(2).write.mode("append").parquet(dir)
    assert(Manifest.refreshManifest(a, dir, cols) == (2L, 0L))
    val d2 = Manifest.manifestDir(a, dir, cols)
    assert(d2 != d1 && !new java.io.File(d1).exists(),
      "refresh must move the durable manifest to the new source address")
    val b = spark.newSession()
    b.conf.set("spark.graft.artifact.root", root)
    assert(Manifest.manifestDir(b, dir, cols) == d2,
      "a later session must serve the refreshed manifest, not rebuild")
    assert(b.read.parquet(d2).agg(sum("n_rows")).head().getLong(0) == 140)
  }

  test("zero-overlap predicate selects zero files and returns empty, schema intact") {
    val ranges = Seq(("l_partkey", -100.0, -1.0))
    val (files, _) = Manifest.selectFiles(spark, zDir, ranges)
    assert(files.isEmpty)
    val df = Manifest.prunedScan(spark, zDir, ranges)
    assert(df.columns.contains("l_returnflag") && df.count() == 0)
  }

  test("snapshot time travel: as-of scans see exactly the frozen file set") {
    import spark.implicits._
    val dir = tmpDir("manifest-snap")
    val cols = Seq("k")
    val all = Seq(("k", 1.0, 1e9))
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.mode("overwrite").parquet(dir)
    Manifest.manifestDir(spark, dir, cols)
    val v1 = Manifest.snapshotManifest(spark, dir, cols)
    assert(v1 === 1)

    // append + refresh + snapshot v2
    (101 to 140).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(2).write.mode("append").parquet(dir)
    Manifest.refreshManifest(spark, dir, cols)
    val v2 = Manifest.snapshotManifest(spark, dir, cols)
    assert(v2 === 2)
    assert(Manifest.snapshotVersions(spark, dir) === Seq(1, 2))

    // v1 sees the original 100 rows; v2 and the live scan see all 140
    assert(Manifest.prunedScanAsOf(spark, dir, all, 1).count() === 100)
    assert(Manifest.prunedScanAsOf(spark, dir, all, 2).count() === 140)
    assert(Manifest.prunedScan(spark, dir, all).count() === 140)
    // as-of selection still prunes: a range inside the appended half
    // touches no v1 file
    assert(Manifest.prunedScanAsOf(spark, dir, Seq(("k", 120.0, 130.0)), 1)
      .count() === 0)
    assert(Manifest.prunedScanAsOf(spark, dir, Seq(("k", 120.0, 130.0)), 2)
      .count() === 11)

    // the snapshot dir is metadata, not data: a refresh after snapshots
    // must remain a no-op (hidden-path filter regression guard)
    assert(Manifest.refreshManifest(spark, dir, cols) === (0L, 0L),
      "snapshot files were statted as data")

    // incremental scan v1→v2 = exactly the appended rows (the change feed)
    val delta = Manifest.incrementalScan(spark, dir, 1, 2)
    assert(delta.count() === 40)
    assert(delta.agg(min(col("k")), max(col("k"))).head() ===
      org.apache.spark.sql.Row(101L, 140L))
    // same-version delta is empty with the schema intact
    val none = Manifest.incrementalScan(spark, dir, 2, 2)
    assert(none.count() === 0 && none.columns.contains("k"))
  }
}

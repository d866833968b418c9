package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The rewrite-then-vacuum lifecycle: logical compaction defers physical
  * deletes (old snapshots stay readable), retention vacuum deletes exactly
  * the files only expired snapshots reference plus never-referenced
  * orphans, and the surviving table is row-exact throughout.
  */
class VacuumSpec extends SparkSuite {

  private val cols = Seq("o_orderkey")

  private def dataFiles(dir: String): Set[String] =
    new java.io.File(dir).listFiles().toSeq
      .map(_.getName).filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSet

  private def freshTable(): String = {
    val dir = tmpDir("vacuum")
    Tables.orders(spark, Sf).repartition(6).write.mode("overwrite").parquet(dir)
    dir
  }

  private def agg(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Double)] =
    df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("p"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  test("compactLogical keeps old files on disk and preserves every row in both snapshots") {
    val dir = freshTable()
    val truth = agg(spark.read.parquet(dir))
    Manifest.manifestDir(spark, dir, cols)
    val v1 = Manifest.snapshotManifest(spark, dir, cols)
    val before = dataFiles(dir)
    assert(before.size == 6)
    val v2 = Manifest.compactLogical(spark, dir, cols, targetFiles = 2)
    assert(v2 == v1 + 1)
    // deferred delete: all 6 old files still present, plus 2 new ones
    val after = dataFiles(dir)
    assert(before.subsetOf(after), "logical compaction must not delete old files")
    assert((after -- before).size == 2, "bin-pack to exactly 2 new files")
    // both snapshots answer identically (pre- and post-compaction layouts)
    assert(agg(Manifest.prunedScanAsOf(spark, dir,
      Seq(("o_orderkey", Double.MinValue, Double.MaxValue)), v1)) == truth)
    assert(agg(Manifest.prunedScanAsOf(spark, dir,
      Seq(("o_orderkey", Double.MinValue, Double.MaxValue)), v2)) == truth)
  }

  test("vacuum respects retention, then deletes exactly the expired layout") {
    val dir = freshTable()
    val truth = agg(spark.read.parquet(dir))
    Manifest.manifestDir(spark, dir, cols)
    val v1 = Manifest.snapshotManifest(spark, dir, cols)
    val preCompaction = dataFiles(dir)
    val v2 = Manifest.compactLogical(spark, dir, cols, targetFiles = 2)
    // retainLast=2 protects both snapshots: nothing may be deleted
    assert(Manifest.vacuum(spark, dir, cols, retainLast = 2) == ((0L, 0L)))
    assert(preCompaction.subsetOf(dataFiles(dir)))
    // retainLast=1 expires v1: its 6 files and its snapshot dir go
    val (nFiles, nSnaps) = Manifest.vacuum(spark, dir, cols, retainLast = 1)
    assert((nFiles, nSnaps) == ((6L, 1L)), s"got ($nFiles, $nSnaps)")
    val survivors = dataFiles(dir)
    assert(survivors.size == 2)
    assert(preCompaction.intersect(survivors).isEmpty, "expired files must be gone")
    assert(Manifest.snapshotVersions(spark, dir) == Seq(v2))
    // the surviving layout is row-exact
    assert(agg(Manifest.prunedScanAsOf(spark, dir,
      Seq(("o_orderkey", Double.MinValue, Double.MaxValue)), v2)) == truth)
    assert(v1 == 1)
  }

  test("vacuum removes never-referenced orphans (crashed-write cleanup)") {
    val dir = freshTable()
    Manifest.manifestDir(spark, dir, cols)
    Manifest.snapshotManifest(spark, dir, cols)
    // plant an orphan: a parquet file no manifest or snapshot references
    Tables.orders(spark, Sf).limit(5).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/.orphan_stage")
    val part = new java.io.File(s"$dir/.orphan_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val orphan = new java.io.File(dir, "part-orphan-deadbeef.parquet")
    java.nio.file.Files.copy(part.toPath, orphan.toPath)
    // the hidden staging dir is invisible; the planted root file is not
    assert(orphan.exists())
    val (nFiles, nSnaps) = Manifest.vacuum(spark, dir, cols, retainLast = 1)
    assert((nFiles, nSnaps) == ((1L, 0L)), s"got ($nFiles, $nSnaps)")
    assert(!orphan.exists(), "orphan must be deleted")
    assert(dataFiles(dir).size == 6, "live files must survive")
  }

  test("shallow clone copies zero data bytes and is isolated from source writes") {
    val src = freshTable()
    val truth = agg(spark.read.parquet(src))
    Manifest.manifestDir(spark, src, cols)
    val clone = Manifest.shallowClone(spark, src, cols)
    // zero data copied: the clone dir holds metadata only
    assert(dataFiles(clone).isEmpty, "clone must not copy data files")
    assert(Manifest.snapshotVersions(spark, clone) == Seq(1))
    def cloneAgg() = agg(Manifest.prunedScanAsOf(spark, clone,
      Seq(("o_orderkey", Double.MinValue, Double.MaxValue)), 1))
    assert(cloneAgg() == truth, "clone must answer as the source at clone time")
    // post-clone source append is invisible to the clone
    Tables.orders(spark, Sf).limit(50).write.mode("append").parquet(src)
    Manifest.refreshManifest(spark, src, cols)
    assert(agg(spark.read.parquet(src)) != truth, "source must have drifted")
    assert(cloneAgg() == truth, "clone leaked post-clone source writes")
  }

  test("vacuum refuses to drop the latest snapshot") {
    val dir = freshTable()
    Manifest.manifestDir(spark, dir, cols)
    intercept[IllegalArgumentException](
      Manifest.vacuum(spark, dir, cols, retainLast = 0))
  }

  test("restore rolls current state to the old snapshot as a NEW version; history intact") {
    val range = Seq(("o_orderkey", Double.MinValue, Double.MaxValue))
    val dir = freshTable()
    val truth = agg(spark.read.parquet(dir))
    Manifest.manifestDir(spark, dir, cols)
    val v1 = Manifest.snapshotManifest(spark, dir, cols)
    // the bad write: a duplicate slice appended and picked up by refresh
    Tables.orders(spark, Sf).where(col("o_orderkey") % 7 === 0)
      .write.mode("append").parquet(dir)
    Manifest.refreshManifest(spark, dir, cols)
    val v2 = Manifest.snapshotManifest(spark, dir, cols)
    val corrupted = agg(Manifest.prunedScanAsOf(spark, dir, range, v2))
    assert(corrupted != truth, "the bad write must be visible in v2")
    val v3 = Manifest.restoreSnapshot(spark, dir, cols, v1)
    assert(v3 == v2 + 1, "restore must mint a NEW version")
    // current state == v1 content; v2 stays readable (history not rewritten)
    assert(agg(Manifest.prunedScanAsOf(spark, dir, range, v3)) == truth)
    assert(agg(Manifest.prunedScanAsOf(spark, dir, range, v1)) == truth)
    assert(agg(Manifest.prunedScanAsOf(spark, dir, range, v2)) == corrupted)
    // zero data moved: the bad files are still on disk, awaiting vacuum
    assert(dataFiles(dir).size > 6)
  }
}

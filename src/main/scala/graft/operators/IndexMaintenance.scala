package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two maintenance moves every key-partitioned served index needs,
  * shared so the IVF (`cell=`), LSH (`sig=`) and BM25 postings
  * (`bucket=`) artifacts cannot drift in their small-file and tombstone
  * handling:
  *
  *  - [[compactPartitions]]: merge partitions whose data-file count
  *    exceeds a cap into one file each (a year of micro-batch appends is
  *    ~100k files per hot partition; the serve-time scan pays file-open +
  *    footer-read per fragment). Cold partitions stay byte-identical.
  *  - [[deleteKeys]]: remove a tombstone id set by rewriting ONLY the
  *    partitions that contain them; a partition whose rows are ALL
  *    deleted is removed explicitly, because dynamic partition overwrite
  *    only touches partitions present in the written data — relying on
  *    it alone would silently resurrect fully-deleted partitions.
  *
  * Both cost ∝ the touched/fragmented partitions, never ∝ |index|. */
private[graft] object IndexMaintenance {

  /** Rewrite every `key=`-partition of `dataDir` holding more than
    * `maxFiles` part-files into a single file. Returns the rewritten
    * partition keys (empty → nothing was fragmented, nothing touched). */
  def compactPartitions(s: SparkSession, dataDir: String, key: String,
      maxFiles: Int): Seq[String] = {
    val root = new Path(dataDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val frag = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$key="))
      .filter(st => fs.listStatus(st.getPath)
        .count(f => f.getPath.getName.startsWith("part-")) > maxFiles)
      .map(_.getPath.getName.stripPrefix(s"$key="))
    if (frag.nonEmpty) {
      // materialize BEFORE overwriting the files being read (the
      // maintained-view read-then-rewrite discipline)
      val rows = s.read.parquet(dataDir)
        .filter(col(key).isin(frag: _*))
        .localCheckpoint()
      rows.repartition(col(key))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(key)
        .parquet(dataDir)
    }
    frag
  }

  /** Delete every row of `dataDir` whose `idCol` appears in `tombstones`
    * (a one-column relation named `idCol`), rewriting only the touched
    * `key=`-partitions. Returns the deleted rows (bounded projection:
    * `key`, `idCol`, plus `carry` columns — materialized BEFORE the
    * rewrite), so callers can decrement derived statistics exactly;
    * empty → the tombstones matched nothing and nothing was touched. */
  def deleteKeys(s: SparkSession, dataDir: String, key: String,
      idCol: String, tombstones: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val tomb = broadcast(tombstones.select(col(idCol)))
    val data = s.read.parquet(dataDir)
    val doomed = data
      .join(tomb, Seq(idCol), "left_semi")
      .select((Seq(key, idCol) ++ carry).map(col): _*)
      .localCheckpoint()
    val touched = doomed.select(key).distinct().collect().map(_.get(0))
    if (touched.nonEmpty) {
      val kept = data
        .filter(col(key).isin(touched: _*))
        .join(tomb, Seq(idCol), "left_anti")
        .localCheckpoint()
      val keptKeys = kept.select(key).distinct().collect().map(_.get(0)).toSet
      kept.repartition(col(key))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(key)
        .parquet(dataDir)
      val fs = new Path(dataDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      touched.filterNot(keptKeys).foreach { k =>
        fs.delete(new Path(dataDir, s"$key=$k"), true)
      }
    }
    doomed
  }
}

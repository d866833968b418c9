package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Z-order layout: per-file min/max ranges must be bounded on BOTH
  * clustered dimensions (that's what row-group pruning consumes), where a
  * linear sort bounds only its leading key. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Average per-file (max-min)/span for a column — the fraction of the
    * value space a file's footer stats cannot exclude. 1.0 = useless for
    * pruning, small = most files skippable. */
  private def avgRange(dir: String, c: String): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 8, s"expected >=8 files in $dir")
    val whole = spark.read.parquet(dir)
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val span = whole.getDouble(1) - whole.getDouble(0)
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / span
    }.sum / files.length
  }

  test("z-order bounds per-file ranges on both dims; linear only on one") {
    val df = Tables.lineitem(spark, Sf).select($"l_partkey", $"l_suppkey")
    val zDir = tmpDir("zorder")
    val linDir = tmpDir("linear")
    ZOrder.writeZOrdered(df, "l_partkey", "l_suppkey", zDir)
    ZOrder.writeLinear(df, "l_partkey", linDir)

    val zP = avgRange(zDir, "l_partkey"); val zS = avgRange(zDir, "l_suppkey")
    val lP = avgRange(linDir, "l_partkey"); val lS = avgRange(linDir, "l_suppkey")
    info(f"z-order:  partkey $zP%.3f  suppkey $zS%.3f")
    info(f"linear:   partkey $lP%.3f  suppkey $lS%.3f")
    // linear: leading key tightly bounded, second dim unpruned (~full span)
    assert(lP < 0.25, s"linear leading-key range should be tight: $lP")
    assert(lS > 0.8, s"linear second dim should be unpruned: $lS")
    // z-order: BOTH dims bounded well below the linear second dim
    assert(zP < 0.6, s"z-order partkey range too wide: $zP")
    assert(zS < 0.6, s"z-order suppkey range too wide: $zS")
    assert(zS < lS / 1.5, s"z-order must beat linear on the second dim: $zS vs $lS")
  }

  test("z-value interleaves bits correctly") {
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y").as("z")).head().getLong(0)
    // x=101, y=011 -> z bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    assert(r == 27L, s"got $r")
  }
}

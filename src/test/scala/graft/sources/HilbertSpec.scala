package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Hilbert-curve layout: the native expression must match a plain-Scala
  * reference encode, consecutive indexes must map to ADJACENT cells (the
  * no-jump property Morton lacks — the entire reason this layout exists),
  * and the written layout must bound per-file ranges on both dims at
  * least as well as z-order in aggregate.
  */
class HilbertSpec extends SparkSuite {
  import spark.implicits._

  /** Reference encode — independent reimplementation of the standard
    * xy→d bit-twiddle (kept deliberately driver-side simple). */
  private def ref(x0: Long, y0: Long, bits: Int = ZOrder.Bits): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse d→(x,y), used to check adjacency without trusting `ref`. */
  private def inv(d0: Long, bits: Int = ZOrder.Bits): (Long, Long) = {
    var (x, y, t) = (0L, 0L, d0)
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  test("native expression matches the reference encode") {
    graft.functions.GraftFunctions.register(spark)
    val pts = {
      val rnd = new scala.util.Random(7)
      Seq.tabulate(512)(_ => (rnd.nextInt(1 << ZOrder.Bits).toLong,
        rnd.nextInt(1 << ZOrder.Bits).toLong)) ++
        Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    }
    val got = pts.toDF("x", "y")
      .select($"x", $"y", expr("graft_hilbert(x, y)").as("d"))
      .collect()
    got.foreach(r => assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
      s"(${r.getLong(0)}, ${r.getLong(1)})"))
  }

  test("consecutive indexes are adjacent cells (no Morton jumps)") {
    // every step of the curve moves exactly 1 in L1 distance
    val rnd = new scala.util.Random(11)
    (1 to 2000).foreach { _ =>
      val d = math.abs(rnd.nextLong()) % ((1L << 32) - 1)
      val (x1, y1) = inv(d)
      val (x2, y2) = inv(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
      // and the encode round-trips through the inverse
      assert(ref(x1, y1) == d, s"roundtrip at d=$d")
    }
  }

  /** Same readout as ZOrderSpec.avgRange. */
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

  test("hilbert layout bounds both dims, in z-order's class or better") {
    val df = Tables.lineitem(spark, Sf).select($"l_partkey", $"l_suppkey")
    val hDir = tmpDir("hilbert"); val zDir = tmpDir("zorder-cmp")
    ZOrder.writeHilbert(df, "l_partkey", "l_suppkey", hDir)
    ZOrder.writeZOrdered(df, "l_partkey", "l_suppkey", zDir)
    val hP = avgRange(hDir, "l_partkey"); val hS = avgRange(hDir, "l_suppkey")
    val zP = avgRange(zDir, "l_partkey"); val zS = avgRange(zDir, "l_suppkey")
    info(f"hilbert: partkey $hP%.3f  suppkey $hS%.3f  (sum ${hP + hS}%.3f)")
    info(f"z-order: partkey $zP%.3f  suppkey $zS%.3f  (sum ${zP + zS}%.3f)")
    assert(hP < 0.6 && hS < 0.6, s"hilbert must bound both dims: $hP / $hS")
    // aggregate bound quality at least z-order's class (10% tolerance —
    // per-instance either curve can win a single dimension)
    assert(hP + hS <= (zP + zS) * 1.10,
      s"hilbert sum-of-ranges ${hP + hS} worse than z-order ${zP + zS} * 1.10")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per JVM via getOrCreate). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Distance from probed rank `q` to the empirical rank INTERVAL of `x`
    * in `xs`: [count(_ < x), count(_ <= x)] / n. Tie-safe: a strict-<
    * point rank undercounts by the tie multiplicity whenever values tie
    * at the probed quantile (routine for integer-valued data in small
    * cells), failing specs even when the sketch under test returned the
    * exact discrete quantile. Distance is 0 whenever lo <= q <= hi.
    */
  def rankIntervalDist(xs: Array[Double], x: Double, q: Double): Double = {
    val n = xs.length.toDouble
    val lo = xs.count(_ < x) / n
    val hi = xs.count(_ <= x) / n
    if (q < lo) lo - q else if (q > hi) q - hi else 0.0
  }
}

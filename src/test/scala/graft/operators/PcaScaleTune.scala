package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the PCA moments pass (SCALE_NOTES Leg 15): the
  * quantized covariance aggregator's claim is one pass, ~17 KB partials,
  * cost linear in rows and independent of partitioning. This main
  * measures momentsOf over synthetic 64-dim vectors at three sizes and
  * two partitionings, and checks bit-identity between them.
  *
  *   sbt "Test/runMain graft.operators.PcaScaleTune"
  */
object PcaScaleTune {

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("pca-scale-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    def vecs(n: Long, parts: Int) = {
      // deterministic pseudo-gaussian-ish floats from xxhash64 residues
      val dims = (0 until Pca.Dim).map(j =>
        ((xxhash64(col("id"), lit(j)) % 2000L).cast("double") / 1000.0d)
          .cast("float"))
      s.range(0, n, 1, parts)
        .select(array(dims: _*).as("embedding"))
    }

    for (n <- Seq(250000L, 500000L, 1000000L)) {
      val t0 = System.nanoTime()
      val a = Pca.momentsOf(vecs(n, 8))
      val dt = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val b = Pca.momentsOf(vecs(n, 31))
      val dt2 = (System.nanoTime() - t1) / 1e9
      val same = a.sameElements(b)
      println(f"PCASCALE n=$n%8d parts8=$dt%6.2fs parts31=$dt2%6.2fs bitIdentical=$same")
      require(same, "moments must not depend on partitioning")
    }
    s.stop()
  }
}

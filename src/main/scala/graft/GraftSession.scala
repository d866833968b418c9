package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale defaults. One place encodes the
  * posture every deployment needs; local[N] for tests, the same settings
  * hold on a 1000-executor cluster (only resource sizing differs).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // AQE: runtime coalescing of small shuffle partitions, skew-join
      // splitting, dynamic join-strategy switch — the knobs that make a
      // static plan survive real 100 TB key distributions.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // push min/max/count aggregates into parquet footer metadata
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // runtime bloom-filter injection: a selective dimension filter is
      // turned into a bloom filter applied on the fact side BEFORE its
      // shuffle — at 100 TB this drops most fact rows at the scan/shuffle
      // boundary of every filtered star join (RuntimeFilterSpec asserts
      // the plan shape; size thresholds stay at Spark defaults so tiny
      // local joins aren't burdened)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // bigger splits: fewer, fuller tasks for huge scans
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

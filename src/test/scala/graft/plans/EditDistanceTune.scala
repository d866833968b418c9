package graft.plans

import org.apache.spark.sql.functions._

/** SCALE_NOTES measurement (run manually): what the edit-distance
  * prefilter rule actually buys on long strings.
  *
  * Fixture: 200k pairs of ~200-char strings, half same-length near-dups
  * (distance ≤ 3 reachable), half with a large length gap (the guard's
  * target). The same filter runs with the rule installed and with the
  * predicate pre-expanded to the naive un-thresholded form (what Spark
  * executes without the rule — the rule itself can't be uninstalled from
  * a live session, so the baseline is the exact expression it replaces).
  */
object EditDistanceTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    val n = 200000
    val base = spark.range(n)
      .select($"id",
        concat_ws("", array_repeat(concat(lit("token"), $"id" % 97), 40)).as("a"))
      .withColumn("b",
        when($"id" % 2 === 0,
          expr("concat(substring(a, 1, length(a) - 5), 'XYZZY')"))  // same length, distance <= 5: banded DP must run and match
          .otherwise(substring($"a", 1, 30)))                       // huge length gap: guard prunes without any DP
      .localCheckpoint()
    println(s"[edtune] rows=${base.count()} avg_len=${base.select(avg(length($"a"))).head().getDouble(0)}")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[edtune] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($c rows)")
    }

    // warm
    base.filter(length($"a") > 0).count()

    timed("naive") {
      // un-thresholded full DP: the rule only rewrites Filter/Join
      // conditions, so the same predicate inside an aggregate projection
      // executes exactly the pre-rule plan
      base.agg(sum(when(levenshtein($"a", $"b") <= 5, 1L).otherwise(0L)))
        .head().getLong(0)
    }
    timed("ruled") {
      // the same user-written predicate as a Filter → rewritten to
      // length-gap guard + banded thresholded DP
      base.filter(levenshtein($"a", $"b") <= 5).count()
    }

    // Hard case: same length, NO shared prefix/suffix (Spark's full
    // levenshtein trims common affixes, which made the pairs above cheap
    // for both paths) — here the full DP really is O(n·m) per row while
    // the banded form walks an 11-wide band and exits early.
    val hard = base.select($"a", reverse($"a").as("b")).localCheckpoint()
    hard.count()
    timed("hard naive") {
      hard.agg(sum(when(levenshtein($"a", $"b") <= 5, 1L).otherwise(0L)))
        .head().getLong(0)
    }
    timed("hard ruled") {
      hard.filter(levenshtein($"a", $"b") <= 5).count()
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** RankStats must reproduce the built-in global window functions EXACTLY
  * (including tie handling) while never planning a single-partition
  * exchange — that equivalence is the whole point of the helper. */
class RankStatsSpec extends SparkSuite {
  import spark.implicits._

  // values with heavy ties and a non-trivial distribution
  private lazy val df = (1 to 5000)
    .map(i => (i.toLong, (i * 2654435761L % 97).toDouble))
    .toDF("id", "v")

  test("withRankCounts matches percent_rank/cume_dist over a global window") {
    val w = Window.orderBy($"v")
    val expected = df
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select($"id", round($"pr", 9).as("pr"), round($"cd", 9).as("cd"))
    val got = RankStats.withRankCounts(df, "v")
      .select($"id",
        round($"__lt" / ($"__n" - 1), 9).as("pr"),
        round($"__le" / $"__n", 9).as("cd"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("withGlobalRowNumber matches row_number over a global window, desc") {
    val w = Window.orderBy($"v".desc, $"id".asc)
    val expected = df.withColumn("rn", row_number().over(w).cast("long"))
      .select($"id", $"rn")
    val got = RankStats.withGlobalRowNumber(df, "v", asc = false, tieCols = Seq("id"))
      .select($"id", $"__rn".as("rn"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("ntileFromRowNumber matches ntile(4) incl. uneven remainder tiles") {
    // 5000 % 4 == 0; also check an uneven n with a second frame
    val uneven = (1 to 103).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    for (d <- Seq(df, uneven)) {
      val w = Window.orderBy($"v".desc, $"id".asc)
      val expected = d.withColumn("t", ntile(4).over(w).cast("long"))
        .select($"id", $"t")
      val got = RankStats.withGlobalRowNumber(d, "v", asc = false, tieCols = Seq("id"))
        .select($"id", RankStats.ntileFromRowNumber($"__rn", $"__n", 4).as("t"))
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    }
  }

  test("no single-partition exchange in the physical plan") {
    for (plan <- Seq(
      RankStats.withRankCounts(df, "v"),
      RankStats.withGlobalRowNumber(df, "v", asc = false, tieCols = Seq("id")))) {
      val physical = plan.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange SinglePartition"),
        s"single-partition exchange leaked into:\n$physical")
    }
  }

  test("sql_win_rank_stats / sql_win_first_last plans avoid global sorts") {
    for (q <- Seq(SqlSurface.winRankStats(spark, Sf), SqlSurface.winFirstLast(spark, Sf))) {
      val physical = q.queryExecution.executedPlan.toString
      // the final ORDER BY for output determinism is allowed to range-
      // partition; what must NOT appear is a SinglePartition exchange
      assert(!physical.contains("Exchange SinglePartition"),
        s"single-partition exchange leaked into:\n$physical")
    }
  }
}

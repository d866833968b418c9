package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The edit-distance prefilter rule: plan rewrite happens, semantics are
  * EXACTLY preserved (including the thresholded Levenshtein's -1 trap),
  * and the registered fuzzy-join query picks it up end-to-end. */
class EditDistancePrefilterSpec extends SparkSuite {
  import spark.implicits._

  private def installed(): Unit =
    graft.functions.GraftFunctions.register(spark)

  test("predicate is rewritten to guard + banded form in the optimized plan") {
    installed()
    // range-backed input: a Seq-backed LocalRelation would be constant-
    // folded away by ConvertToLocalRelation before the plan can be read
    val df = spark.range(10)
      .select(concat(lit("a"), $"id").as("a"), concat(lit("b"), $"id").as("b"))
      .filter(levenshtein($"a", $"b") <= 2)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(2)) >= 0"), opt)      // banded form + -1 guard
    assert(opt.contains("abs((length("), opt)       // length-gap guard present
  }

  test("rewritten filter keeps exact levenshtein semantics (incl. d > k -> -1)") {
    installed()
    val pairs = Seq(
      ("kitten", "sitting"),   // d = 3
      ("abc", "abd"),          // d = 1
      ("abc", "abc"),          // d = 0
      ("a", "abcdefgh"),       // d = 7, length gap 7 (guard prunes at k=3)
      ("abcdef", "fedcba"))    // d = 6, same length (banded DP must return -1)
      .toDF("a", "b")
    // ground truth from the UN-thresholded expression, filtered in Scala
    val truth = pairs.select($"a", $"b", levenshtein($"a", $"b").as("d"))
      .collect().filter(_.getInt(2) <= 3).map(r => (r.getString(0), r.getString(1))).toSet
    val got = pairs.filter(levenshtein($"a", $"b") <= 3)
      .select($"a", $"b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === truth)
    assert(got === Set(("kitten", "sitting"), ("abc", "abd"), ("abc", "abc")))
    // strict < and the reversed literal-first form rewrite too
    assert(pairs.filter(levenshtein($"a", $"b") < 1).count() == 1)
    assert(pairs.filter(lit(1) >= levenshtein($"a", $"b")).count() == 2)
  }

  test("the registered fuzzy join is rewritten and its output is unchanged") {
    installed()
    val q = graft.operators.EntityRes.fuzzyJoinBlocked(spark, Sf)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(3)) >= 0"), opt)
    // BatchOpsSpec pins the output itself; spot-check a known pair here
    val pair = q.filter($"name_a" === "old bolt" && $"name_b" === "red bolt")
    assert(pair.count() == 1)
  }

  test("rule is idempotent: a second optimizer pass changes nothing") {
    installed()
    val plan = Seq(("x", "y")).toDF("a", "b")
      .filter(levenshtein($"a", $"b") <= 1)
      .queryExecution.optimizedPlan
    assert(EditDistancePrefilter(plan).toString === plan.toString)
  }
}

package graft

/** Structural plan audit over the ENTIRE registered query surface: no
  * query may plan a CartesianProduct or BroadcastNestedLoopJoin — the two
  * shapes that are always a scale accident (a missing equi-condition or a
  * non-pushable join predicate). OperatorSpec asserts this for headline
  * plans; this sweep pins every one of the ~106 registered queries so a
  * new operator can't regress quietly. (Queries that materialize eagerly
  * return LocalRelations — trivially clean — and the lazy ones only get
  * PLANNED here, not executed.) */
class PlanHygieneSpec extends SparkSuite {

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.allDefs.flatMap { q =>
      val plan =
        try q.fn(spark, Sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: ${e.getMessage}" }
      if (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin") ||
          plan.startsWith("PLANNING FAILED"))
        Some(q.name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n: $p" }.mkString("\n"))
  }
}

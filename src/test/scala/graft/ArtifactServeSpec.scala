package graft

import graft.operators.SessionCaches

/** Round-6 verdict "Next round" #3: pin the artifact SERVE path with a
  * plan assert. The SessionCaches architecture makes the serve path a
  * FileScan by construction (`parquetArtifact` returns
  * `spark.read.parquet(dir)`), but nothing failed if a future
  * "optimization" quietly reintroduced a driver-collected LocalRelation
  * memo — round 5's scale bug. This spec detects every artifact-backed
  * query dynamically (constructing the query registers its artifact), then
  * asserts the warm-serve PLAN of each reads a `graft-artifact-` path
  * through a file source and carries no local-relation shape of the
  * artifact's making. */
class ArtifactServeSpec extends SparkSuite {

  test("every artifact-backed query serves its artifact as a FileScan, never a LocalRelation") {
    SessionCaches.clear(spark)
    val checked = SparkEntry.allDefs.flatMap { q =>
      val before = SessionCaches.dirKeys(spark)
      // First construction builds + registers the artifact (artifact
      // builds are eager; the query itself stays lazy — not executed).
      // Bounded `memo` values (centroids, codebooks) are NOT dir
      // artifacts and don't make a query artifact-backed here.
      try q.fn(spark, Sf) catch { case _: Throwable => () }
      if (SessionCaches.dirKeys(spark) == before) None
      else {
        // Second construction is the warm SERVE path — the one a service
        // actually runs. Its optimized plan must scan the artifact dir.
        val df = q.fn(spark, Sf)
        val plan = df.queryExecution.optimizedPlan.toString
        val executed = df.queryExecution.executedPlan.toString
        Some((q.name, plan, executed))
      }
    }
    // the artifact-backed family is a known, non-trivial surface — if this
    // ever drops to a handful, detection itself broke
    assert(checked.size >= 10,
      s"expected 10+ artifact-backed queries, detected ${checked.size}")
    val offenders = checked.flatMap { case (name, plan, executed) =>
      val servesArtifact =
        plan.contains("graft-artifact-") || executed.contains("graft-artifact-")
      // a driver-side memo would surface as LocalRelation/LocalTableScan
      // standing in for the artifact relation
      val localShape =
        plan.contains("LocalRelation") || executed.contains("LocalTableScan")
      if (!servesArtifact) Some(s"$name: no graft-artifact FileScan in serve plan")
      else if (localShape) Some(s"$name: LocalRelation/LocalTableScan in serve plan")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}

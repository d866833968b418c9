package graft.operators

import org.apache.spark.sql.functions._

/** Scale probe for the whole-row fingerprint snapshot diff
  * (`audit_snapshot_diff` / [[Audit.snapshotDiffOf]]): the sweep runs it
  * on 150k orders rows; this drives the SAME plan at 10M keys per side —
  * the "did the backfill move what we think it moved" audit at the scale
  * a nightly reconciliation actually runs — and cross-checks every class
  * count against exact modular arithmetic computed driver-side.
  *
  * What the timing isolates: both snapshots are generated narrow maps
  * over `spark.range` (no disk staging), so the wall time is the diff
  * itself — two md5 projections, ONE full-outer shuffle join on the key,
  * and a 4-row count aggregate. Findings land in SCALE_NOTES Leg 24.
  *
  *   sbt "Test/runMain graft.operators.SnapshotDiffProbe"
  *   SNAP_ROWS=1000000 sbt "Test/runMain ..."   # quicker iteration
  */
object SnapshotDiffProbe {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SNAP_ROWS", "10000000").toLong
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    // synthetic keyed snapshot: deterministic non-key columns so the
    // fingerprints are stable and incompressible-ish
    def snap = spark.range(n).select($"id".as("key"),
      md5(concat_ws("|",
        ($"id" % 3).cast("string"), ($"id" % 5).cast("string"),
        pmod(xxhash64($"id"), lit(1000000L)).cast("string"))).as("fp"))
    val v1 = snap
    val v2base = spark.range(n).filter($"id" % 97 =!= 0).select($"id".as("key"),
      md5(concat_ws("|",
        ($"id" % 3).cast("string"),
        when($"id" % 101 === 0, lit("9")) // changed class
          .otherwise(($"id" % 5).cast("string")),
        pmod(xxhash64($"id"), lit(1000000L)).cast("string"))).as("fp"))
    val added = spark.range(n).filter($"id" % 103 === 0)
      .select(($"id" + lit(10_000_000_000L)).as("key"),
        md5(concat_ws("|",
          ($"id" % 3).cast("string"), ($"id" % 5).cast("string"),
          pmod(xxhash64($"id"), lit(1000000L)).cast("string"))).as("fp"))
    val v2 = v2base.unionByName(added)

    def timed(): (Double, Map[String, Long]) = {
      val t0 = System.nanoTime()
      val rows = Audit.snapshotDiffOf(v1, v2).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, rows.map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    timed() // untimed JIT/codegen warm-up
    val reps = (1 to 3).map(_ => timed())
    val walls = reps.map(_._1).sorted
    val got = reps.head._2

    // exact expectation by the same modular rules, driver-side
    var (removed, changed, unchanged, addedN) = (0L, 0L, 0L, 0L)
    var i = 0L
    while (i < n) {
      if (i % 97 == 0) removed += 1
      else if (i % 101 == 0) changed += 1
      else unchanged += 1
      if (i % 103 == 0) addedN += 1
      i += 1
    }
    val expect = Map("added" -> addedN, "removed" -> removed,
      "changed" -> changed, "unchanged" -> unchanged)
    require(got == expect, s"class counts drifted: $got vs $expect")

    println(f"[snapdiff] n=$n%,d per side  " +
      f"wall med=${walls(1)}%.2f s [${walls.head}%.2f, ${walls.last}%.2f]  " +
      s"classes=$expect  census exact: OK")
    spark.stop()
  }
}

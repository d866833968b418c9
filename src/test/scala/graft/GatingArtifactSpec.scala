package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed-gating-artifact guard (round-13 verdict "Next round"
  * #1): round 13's end-of-round `git add -A` snapshot swept a
  * self-labeled-contended bench envelope over the policy-compliant quiet
  * artifact, so HEAD's BENCH_HEADLINE.json violated the policy stated in
  * its own `timing` string. Bench now refuses to write a non-quiet (or
  * non-sf0.1) run to the gating name — this spec is the committed
  * BACKSTOP: if a policy-violating file ever lands at the gating path
  * again (hand copy, tooling change, partial write), `sbt test` goes red
  * before the commit ships.
  *
  * The checks are plain string asserts against the file's own
  * self-labels, deliberately parser-free: the guard must fail on a
  * malformed envelope too (a truncated write would otherwise pass a
  * lenient JSON parse of the prefix). */
class GatingArtifactSpec extends AnyFunSuite {

  private def envelope: Option[String] = {
    // sbt test runs with cwd = repo root; a fresh checkout before the
    // first bench has no artifact yet — nothing to guard
    val p = java.nio.file.Paths.get("BENCH_HEADLINE.json")
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p))
    else None
  }

  test("committed BENCH_HEADLINE.json self-labels quiet (policy)") {
    envelope.foreach { j =>
      assert(j.contains("\"host_contended\":false"),
        "gating artifact self-labels host_contended != false — a " +
          "contended run was committed to the gating name")
      assert(j.contains("\"leg_contended\":[]"),
        "gating artifact carries non-empty leg_contended — a run with " +
          "contended legs was committed to the gating name")
    }
  }

  test("committed BENCH_HEADLINE.json is an sf0.1 sweep") {
    // the other known sweep-in hazard: a local sf0.01 iteration run
    // overwriting the gating artifact and riding in on a bulk add
    envelope.foreach { j =>
      val sf = "\"sf\":\"([^\"]*)\"".r.findFirstMatchIn(j).map(_.group(1))
      assert(sf.exists(_.endsWith("sf0.1")),
        s"gating artifact swept $sf, not the gating sf0.1")
    }
  }

  test("committed BENCH_HEADLINE.json is a complete envelope") {
    envelope.foreach { j =>
      assert(j.contains("\"metric\":\"headline_total\""))
      assert(j.trim.endsWith("}"), "gating artifact is truncated")
    }
  }
}

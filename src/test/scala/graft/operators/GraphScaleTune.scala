package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Manual scale probe for the graph family (run:
  * sbt "Test/runMain graft.operators.GraphScaleTune"). Results recorded in
  * SCALE_NOTES.md Leg 17.
  *
  * The question the small-sf oracle cannot answer: does the degree
  * orientation actually neutralize a mega-hub at realistic edge counts?
  * Builds a 2M-edge graph over 1M nodes with ONE planted hub of degree
  * ~200k (the "celebrity node" every social/web graph has), then
  * measures the wedge-relation size the triangle join actually shuffles —
  * against the Σ C(deg,2) blow-up a naive shared-endpoint join would pay —
  * plus end-to-end triangle and k-core wall time.
  */
object GraphScaleTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[graph-tune] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val nNodes = 1_000_000L
    // 1.8M pseudo-random edges + 200k hub spokes onto node 0
    val rand = spark.range(0, 1_800_000L).select(
      pmod(xxhash64(col("id"), lit("a")), lit(nNodes)).as("src"),
      pmod(xxhash64(col("id"), lit("b")), lit(nNodes)).as("dst"))
    val hub = spark.range(0, 200_000L).select(
      lit(0L).as("src"),
      (pmod(xxhash64(col("id"), lit("h")), lit(nNodes - 1)) + 1L).as("dst"))
    val edges = rand.unionAll(hub).where(col("src") =!= col("dst")).persist()
    println(s"[graph-tune] raw edges: ${edges.count()}")

    // ---- the naive cost a shared-endpoint wedge join would pay
    val und = edges
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct().persist()
    val deg = und.select($"a".as("node")).unionAll(und.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val naive = deg.agg(sum(expr("d * (d - 1) div 2"))).head().getLong(0)
    val maxDeg = deg.agg(max($"d")).head().getLong(0)
    println(s"[graph-tune] max degree: $maxDeg, naive wedge bound: $naive")

    // ---- what the oriented plan actually enumerates
    val outDeg = Graph.orientedEdges(edges).groupBy($"u").agg(count(lit(1)).as("od"))
    val oriented = outDeg.agg(
      sum(expr("od * (od - 1) div 2")).as("wedges"), max($"od").as("mx")).head()
    println(s"[graph-tune] oriented wedges: ${oriented.getLong(0)}, " +
      s"max oriented out-degree: ${oriented.getLong(1)} " +
      f"(${naive.toDouble / oriented.getLong(0)}%.0f× below naive)")

    // per-stage decomposition of the triangle pipeline
    val or2 = time("  stage: orient (und+deg+join)") {
      val o = Graph.orientedEdges(edges).persist(); o.count(); o
    }
    val wedges = time("  stage: wedge self-join") {
      val w = or2.select($"u", $"v".as("x"), $"rv".as("rx"))
        .join(or2.select($"u", $"v".as("y"), $"rv".as("ry")), "u")
        .where($"rx" < $"ry").persist()
      w.count(); w
    }
    time("  stage: close wedges against edges") {
      wedges.join(or2.select($"u".as("x"), $"v".as("y")), Seq("x", "y")).count()
    }
    val tris = time("triangleCounts end-to-end (2M edges, 200k-degree hub)") {
      Graph.triangleCountsOf(edges).agg(sum($"triangles")).head().getLong(0)
    }
    println(s"[graph-tune] triangle incidences: $tris")

    time("kCore end-to-end (10 peel rounds)") {
      Graph.kCoreOf(edges).where($"in_kcore" === 1).count()
    }
    spark.stop()
  }
}

package graft.operators

/** Ad-hoc cold-timing probe for audit_dependency_entropy (run manually;
  * result recorded in the leg() scaladoc + SURVEY round notes). */
object EntropyTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    // warmup on a different query class: JIT + codegen, not this plan
    Audit.fdDiscovery(spark, d).collect()
    val t0 = System.nanoTime()
    Audit.dependencyEntropy(spark, d).collect()
    println(f"[entropyprobe] cold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}

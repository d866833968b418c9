package graft.operators

import java.nio.file.{Files, Paths}

/** Dump the INTERNAL pair-generation pipeline plans (the registered
  * pair queries collect bounded rows, so their own explain is a
  * LocalTableScan — the exchange-count evidence lives here).
  *
  *   Test/runMain graft.operators.PairGenPlanDump <outDir>
  */
object PairGenPlanDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/pairgen_plans")
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Files.createDirectories(Paths.get(out))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      Files.writeString(Paths.get(out, s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    val (lshPairs, sigs) = Dedup.lshCandidates(spark, d)
    dump("lsh_pairgen", lshPairs)
    sigs.unpersist(blocking = false)
    val (simEdges, hashed) = Dedup.simhashEdges(spark, d, maxHamming = 16)
    dump("simhash_pairgen", simEdges)
    hashed.unpersist(blocking = false)
    spark.stop()
  }
}

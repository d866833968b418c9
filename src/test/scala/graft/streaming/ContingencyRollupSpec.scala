package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Drift

/** The drift-statistic maintained view (CorpusStream.upsertContingencyRollup):
  * the incrementally-built lang × source census must equal a from-scratch
  * census of everything ingested, and the χ²/MI served FROM the cells must
  * equal the batch statistics computed directly over the unioned documents
  * — bit-for-bit, because both paths reduce to the same exact-integer cell
  * grid before any floating-point step.
  */
class ContingencyRollupSpec extends SparkSuite {
  import spark.implicits._

  test("incremental census exact; served chi2/MI equal direct batch computation") {
    val dir = tmpDir("contingency") + "/cells"
    val docs = graft.Tables.documents(spark, Sf)
      .select($"doc_id", $"lang", $"source").localCheckpoint()
    (0 to 2).foreach { r =>
      CorpusStream.upsertContingencyRollup(docs.filter($"doc_id" % 3 === r), dir)
    }
    val cells = spark.read.parquet(dir).select($"lang", $"source", $"o")
    val exact = docs.groupBy($"lang", $"source").agg(count(lit(1)).as("o_exact"))
    assert(cells.count() == exact.count())
    assert(cells.join(exact, Seq("lang", "source"))
      .filter($"o" =!= $"o_exact").count() == 0)

    val servedChi2 = CorpusStream.servedChi2(spark, dir).head()
    val directChi2 = Drift.chi2Of(docs).head()
    assert(servedChi2 == directChi2, s"served=$servedChi2 direct=$directChi2")
    val servedMi = CorpusStream.servedMi(spark, dir).head()
    val directMi = Drift.miOf(docs).head()
    assert(servedMi == directMi, s"served=$servedMi direct=$directMi")
  }
}

package graft.operators

import graft.SparkSuite

/** Materialized ANN indexes (round-3 verdict #3): the indexed kNN variants
  * must (a) return exactly what the scan variants return — the index is a
  * layout change, not a semantics change — and (b) plan the probe as a
  * PARTITION filter, so the scan lists only the probed cell/sig
  * directories instead of computing assignments over the full corpus per
  * query. (b) is the 100 TB property: probing is directory pruning, the
  * same mechanism BucketedSpec/ZOrderSpec pin for relational tables.
  */
class AnnIndexSpec extends SparkSuite {

  private def scanOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("IVF indexed kNN matches the scan variant exactly") {
    val scan = Similarity.knnIvf(spark, Sf).collect().toSeq
    val indexed = Similarity.knnIvfIndexed(spark, Sf).collect().toSeq
    assert(indexed == scan)
  }

  test("LSH indexed kNN matches the scan variant exactly") {
    val scan = Similarity.knnLsh(spark, Sf).collect().toSeq
    val indexed = Similarity.knnLshIndexed(spark, Sf).collect().toSeq
    assert(indexed == scan)
  }

  test("IVF probe is a partition filter on the materialized index") {
    val plan = scanOf(Similarity.knnIvfIndexed(spark, Sf))
    assert(plan.contains("PartitionFilters"), plan)
    // the cell probe must appear in PartitionFilters (directory pruning),
    // NOT as a post-scan Filter over a computed column
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cell"), pf)
  }

  test("LSH probe is a partition filter on the materialized index") {
    val plan = scanOf(Similarity.knnLshIndexed(spark, Sf))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined, plan)
    assert(pf.get.contains("sig"), pf.get)
  }

  test("planted embedding clusters recover exactly the planted pairs") {
    val out = Similarity.plantedEmbeddingClusters(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val nBase = graft.Tables.embeddings(spark, Sf).count()
    val planted = graft.Tables.embeddings(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // exactly the planted pairs cluster: each source vec with its +1e9 copy
    assert(out.length == 2 * planted.size, s"rows=${out.length} planted=${planted.size} base=$nBase")
    planted.foreach { v =>
      val cluster = out.filter(_._2 == v)
      assert(cluster.map(_._1).toSet == Set(v, v + 1000000000L), s"vec $v: ${cluster.toSeq}")
      assert(cluster.forall(_._3 == 2L))
      // representative (min id = the source) is the keeper
      assert(cluster.filter(_._4 == 1).map(_._1).toSeq == Seq(v))
    }
  }
}

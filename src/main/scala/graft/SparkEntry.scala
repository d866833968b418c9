package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator module contributes `Q(name, oracleSql, fn)` descriptors;
  * this object is just the aggregation point.
  */
object SparkEntry {

  /** All operator definitions, in module order. */
  def allDefs: Seq[Q] =
    Relational.defs ++ EventOps.defs ++ Temporal.defs ++ Timeseries.defs ++
      Functions.defs ++
      SqlSurface.defs ++ TextOps.defs ++ Datasheet.defs ++ Bpe.defs ++ NgramLm.defs ++ Search.defs ++ Dedup.defs ++ CorpusDedup.defs ++
      Similarity.defs ++ AnnPanel.defs ++ Rag.defs ++ LateInteraction.defs ++ Kmeans.defs ++
      Classifier.defs ++ LrTrain.defs ++ Pca.defs ++
      Pq.defs ++ Sq8.defs ++ Sampling.defs ++ Hll.defs ++ Kll.defs ++
      HeavyHitters.defs ++ Multimodal.defs ++ Basket.defs ++
      Audio.defs ++
      Audit.defs ++ EntityRes.defs ++ Drift.defs ++ EmbeddingAudit.defs ++ Graph.defs ++
      graft.sources.Bucketed.defs ++ graft.sources.Formats.defs ++
      graft.sources.Manifest.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

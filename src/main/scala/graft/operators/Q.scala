package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One public operator of the engine, in driver-contract form.
  *
  * @param name   key in `SparkEntry.queries`
  * @param oracle equivalent ANSI SQL for the DuckDB differential check;
  *               None for ops not expressible in portable SQL (LSH, cosine
  *               top-k, ...) — the driver then records a rows-only check.
  * @param fn     the Spark plan builder `(session, sfDir) => DataFrame`
  *
  * Conventions shared by every Q (driver compare is hash-based):
  *  - every output column is explicitly aliased, identically on both sides;
  *  - both sides end in the same fully-deterministic ORDER BY (ties broken
  *    by a key column) so row order can never diverge;
  *  - double aggregates are rounded (2-4 dp) on both sides to absorb
  *    floating-point summation-order differences between engines;
  *  - integer aggregates are pinned to BIGINT in SQL (DuckDB widens
  *    SUM(int) to HUGEINT, Spark keeps LongType).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity-resolution and dimension-maintenance operators: blocked fuzzy
  * matching (the record-linkage primitive) and SCD-2 merge (the
  * slowly-changing-dimension upsert every warehouse runs nightly).
  *
  * Scale shape — fuzzy join:
  *  - Never all-pairs. Candidate pairs are generated ONLY inside blocks
  *    (here: the head noun of the name — in a real pipeline a phonetic
  *    key, a sorted-neighborhood window, or an LSH bucket, exactly like
  *    [[Dedup.minHashLsh]]). The cross join is per-block, so its cost is
  *    Σ|block|², bounded by the block-size cap a production run enforces,
  *    not |corpus|².
  *  - Matching runs on the DISTINCT entity strings, not the raw rows:
  *    at 100 TB you dedupe to the entity vocabulary first (bounded —
  *    names, brands, addresses repeat), match once, and semi-join the
  *    verdicts back.
  *  - `levenshtein` is Spark's codegen'd native expression; the block
  *    key equality is the shuffle key.
  *
  * Scale shape — SCD-2 merge:
  *  - One shuffle join between the current dimension and the update
  *    batch on the natural key; every output branch (carried, closed,
  *    opened) is a narrow projection of that join. No driver state, no
  *    per-key loops; with the dimension bucketed by key (see
  *    [[graft.sources.Bucketed]]) the join is exchange-free, and a real
  *    sink rewrites only touched partitions (the
  *    [[graft.streaming.Ingest.upsertRollup]] pattern).
  */
object EntityRes {

  /** Fuzzy self-match of part names: pairs of distinct names that share
    * a block (their last word) and are within Levenshtein distance 3.
    * The classic record-linkage candidate+verify shape. */
  def fuzzyJoinBlocked(s: SparkSession, d: String): DataFrame =
    fuzzyJoinBlockedOf(Tables.part(s, d))

  def fuzzyJoinBlockedOf(part: DataFrame): DataFrame = {
    val s = part.sparkSession
    import s.implicits._
    // Names with no [a-z] tail would all share block "" — one vacuous
    // mega-block that quietly recreates the all-pairs blowup blocking
    // exists to prevent. Such names get no block and no candidates (a
    // production pipeline routes them to a second blocking key instead).
    val names = part
      .select($"p_name".as("name")).distinct()
      .withColumn("block", regexp_extract($"name", "[a-z]+$", 0))
      .filter($"block" =!= "")
    val a = names.select($"name".as("name_a"), $"block")
    val b = names.select($"name".as("name_b"), $"block")
    a.join(b, Seq("block"))
      .filter($"name_a" < $"name_b")
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 3)
      .select($"block", $"name_a", $"name_b", $"dist")
      .orderBy($"block", $"name_a", $"name_b")
  }

  val fuzzyJoinBlockedOracle: String =
    """WITH names AS (
      |  SELECT DISTINCT p_name AS name FROM part),
      |b AS (
      |  SELECT name, regexp_extract(name, '[a-z]+$') AS block FROM names
      |  WHERE regexp_extract(name, '[a-z]+$') <> '')
      |SELECT a.block AS block, a.name AS name_a, c.name AS name_b,
      |       CAST(levenshtein(a.name, c.name) AS INT) AS dist
      |FROM b a JOIN b c ON a.block = c.block AND a.name < c.name
      |WHERE levenshtein(a.name, c.name) <= 3
      |ORDER BY block, name_a, name_b""".stripMargin

  /** SCD-2 merge: apply an update batch (deterministically derived here —
    * every 7th customer moves to segment 'RESEGMENTED' effective
    * 2024-06-01) to the type-2 history seeded from the current dimension
    * (all rows valid from 2024-01-01, open-ended).
    *
    * Output is the full post-merge history: unchanged keys keep their
    * open row; changed keys get their old row closed at the effective
    * date plus a new open row. */
  def scd2Upsert(s: SparkSession, d: String): DataFrame =
    scd2UpsertOf(Tables.customer(s, d))

  def scd2UpsertOf(customer: DataFrame): DataFrame = {
    val s = customer.sparkSession
    import s.implicits._
    val dim = customer
      .select($"c_custkey".as("custkey"), $"c_mktsegment".as("segment"))
    val updates = dim.filter($"custkey" % 7 === 0)
      .select($"custkey", lit("RESEGMENTED").as("new_segment"))
    val seeded = dim.join(updates, Seq("custkey"), "left")
    // Validity bounds ride as ISO-8601 strings: the driver compare
    // stringifies date objects differently across engines, and a type-2
    // key is an interval label, not date arithmetic.
    val carried = seeded.filter($"new_segment".isNull)
      .select($"custkey", $"segment",
        lit("2024-01-01").as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current"))
    val closed = seeded.filter($"new_segment".isNotNull)
      .select($"custkey", $"segment",
        lit("2024-01-01").as("valid_from"),
        lit("2024-06-01").as("valid_to"),
        lit(false).as("is_current"))
    val opened = seeded.filter($"new_segment".isNotNull)
      .select($"custkey", $"new_segment".as("segment"),
        lit("2024-06-01").as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current"))
    carried.unionAll(closed).unionAll(opened)
      .orderBy($"custkey", $"valid_from")
  }

  val scd2UpsertOracle: String =
    """WITH dim AS (
      |  SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer),
      |upd AS (
      |  SELECT custkey, 'RESEGMENTED' AS new_segment FROM dim WHERE custkey % 7 = 0),
      |seeded AS (
      |  SELECT dim.custkey, dim.segment, upd.new_segment
      |  FROM dim LEFT JOIN upd USING (custkey))
      |SELECT * FROM (
      |  SELECT custkey, segment, '2024-01-01' AS valid_from,
      |         CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
      |  FROM seeded WHERE new_segment IS NULL
      |  UNION ALL
      |  SELECT custkey, segment, '2024-01-01', '2024-06-01', FALSE
      |  FROM seeded WHERE new_segment IS NOT NULL
      |  UNION ALL
      |  SELECT custkey, new_segment, '2024-06-01', CAST(NULL AS VARCHAR), TRUE
      |  FROM seeded WHERE new_segment IS NOT NULL)
      |ORDER BY custkey, valid_from""".stripMargin

  /** Snapshot diff: compare the dimension BEFORE and AFTER the SCD-2
    * update batch (both derived deterministically here) and classify every
    * key as unchanged / changed. The general op also yields added/removed
    * keys from the same full-outer join — the synthetic batch has none, so
    * the changed/unchanged split is the observable output; the audit every
    * nightly dimension load runs before publishing.
    *
    * Scale: ONE full-outer shuffle join on the key (exchange-free if both
    * snapshots are bucketed on it); the classification is a narrow
    * projection. Reported as per-class counts — bounded output. The
    * whole-row sibling is [[graft.operators.Audit.snapshotDiff]]
    * (`audit_snapshot_diff`): multi-column md5-fingerprint comparison
    * with diverging key sets, so added/removed fire too. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val before = Tables.customer(s, d)
      .select($"c_custkey".as("custkey"), $"c_mktsegment".as("seg_before"))
    val after = before
      .withColumn("seg_after",
        when($"custkey" % 7 === 0, lit("RESEGMENTED")).otherwise($"seg_before"))
      .select($"custkey", $"seg_after")
    before.join(after, Seq("custkey"), "full_outer")
      .select(
        when($"seg_before".isNull, lit("added"))
          .when($"seg_after".isNull, lit("removed"))
          .when($"seg_before" === $"seg_after", lit("unchanged"))
          .otherwise(lit("changed")).as("diff_class"))
      .groupBy($"diff_class")
      .agg(count(lit(1)).as("n_keys"))
      .orderBy($"diff_class")
  }

  val snapshotDiffOracle: String =
    """WITH before_s AS (
      |  SELECT c_custkey AS custkey, c_mktsegment AS seg_before FROM customer),
      |after_s AS (
      |  SELECT custkey,
      |         CASE WHEN custkey % 7 = 0 THEN 'RESEGMENTED' ELSE seg_before END AS seg_after
      |  FROM before_s)
      |SELECT CASE WHEN seg_before IS NULL THEN 'added'
      |            WHEN seg_after IS NULL THEN 'removed'
      |            WHEN seg_before = seg_after THEN 'unchanged'
      |            ELSE 'changed' END AS diff_class,
      |       CAST(count(*) AS BIGINT) AS n_keys
      |FROM before_s FULL OUTER JOIN after_s USING (custkey)
      |GROUP BY 1 ORDER BY diff_class""".stripMargin

  /** MERGE INTO (Delta/Iceberg semantics) applied as one full-outer
    * join: a CDC batch of inserts/updates/deletes lands on the `orders`
    * snapshot in a single pass —
    *
    *   WHEN MATCHED AND op = 'D' THEN DELETE
    *   WHEN MATCHED AND op = 'U' THEN UPDATE SET status, totalprice
    *   WHEN NOT MATCHED THEN INSERT
    *
    * The change batch is derived deterministically from the target
    * itself (deletes: key % 13 = 5; updates: key % 7 = 0, precedence to
    * delete; inserts: fresh keys offset by 10^7 from the % 97 = 3
    * slice), so both engines build the identical batch and the oracle is
    * fully independent.
    *
    * Scale shape: ONE shuffle join on the merge key — the same exchange
    * a MERGE on any lakehouse engine pays; with the target bucketed on
    * the key (sources/Bucketed.scala) the target side is exchange-free.
    * In the warehouse this composes with manifest pruning
    * (sources/Manifest.scala): the join classifies touched FILES first
    * and rewrites only those — the copy-on-write contract; here the
    * output is the full post-merge snapshot, which is what the oracle
    * can pin row-for-row. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val target = Tables.orders(s, d)
      .select($"o_orderkey".as("okey"), $"o_orderstatus".as("status"),
        $"o_totalprice".as("totalprice"))
    val changes = target
      .select($"okey",
        when($"okey" % 13 === 5, lit("D"))
          .when($"okey" % 7 === 0, lit("U"))
          .when($"okey" % 97 === 3, lit("I"))
          .as("op"),
        $"totalprice")
      .filter($"op".isNotNull)
      .select(
        when($"op" === "I", $"okey" + 10000000L).otherwise($"okey").as("okey"),
        $"op",
        when($"op" === "U", lit("U")).otherwise(lit("I")).as("n_status"),
        // +10.0 (one exact IEEE add), not ×1.1: a product lands arbitrarily
        // close to .xx5 round boundaries where the two engines' half-up
        // conventions disagree on the binary value.
        when($"op" === "U", $"totalprice" + lit(10.0))
          .otherwise($"totalprice").as("n_totalprice"))
    target.join(changes, Seq("okey"), "full_outer")
      .where(coalesce($"op", lit("")) =!= "D")
      .select(
        $"okey".as("o_orderkey"),
        when($"op".isNotNull, $"n_status").otherwise($"status").as("o_orderstatus"),
        round(when($"op".isNotNull, $"n_totalprice").otherwise($"totalprice"), 2)
          .as("o_totalprice"))
      .orderBy($"o_orderkey")
  }

  val mergeUpsertOracle: String =
    """WITH target AS (
      |  SELECT o_orderkey AS okey, o_orderstatus AS status,
      |         o_totalprice AS totalprice
      |  FROM orders),
      |classified AS (
      |  SELECT okey,
      |         CASE WHEN okey % 13 = 5 THEN 'D'
      |              WHEN okey % 7 = 0 THEN 'U'
      |              WHEN okey % 97 = 3 THEN 'I' END AS op,
      |         totalprice
      |  FROM target
      |  WHERE okey % 13 = 5 OR okey % 7 = 0 OR okey % 97 = 3),
      |changes AS (
      |  SELECT CASE WHEN op = 'I' THEN okey + 10000000 ELSE okey END AS okey,
      |         op,
      |         CASE WHEN op = 'U' THEN 'U' ELSE 'I' END AS n_status,
      |         CASE WHEN op = 'U' THEN totalprice + 10.0
      |              ELSE totalprice END AS n_totalprice
      |  FROM classified)
      |SELECT okey AS o_orderkey,
      |       CASE WHEN c.op IS NOT NULL THEN c.n_status ELSE t.status END
      |         AS o_orderstatus,
      |       round(CASE WHEN c.op IS NOT NULL THEN c.n_totalprice
      |                  ELSE t.totalprice END, 2) AS o_totalprice
      |FROM target t FULL OUTER JOIN changes c USING (okey)
      |WHERE COALESCE(c.op, '') <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("join_fuzzy_blocked", Some(fuzzyJoinBlockedOracle), fuzzyJoinBlocked),
    Q("dim_scd2_upsert", Some(scd2UpsertOracle), scd2Upsert),
    Q("wh_merge_upsert", Some(mergeUpsertOracle), mergeUpsert),
    Q("dim_snapshot_diff", Some(snapshotDiffOracle), snapshotDiff))
}

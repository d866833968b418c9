package graft.operators

/** Committed golden oracles for queries whose SEMANTICS DuckDB cannot
  * express (sketches, codecs, LSH) but whose OUTPUT is bit-deterministic.
  *
  * Two forms:
  *
  *  - [[refMinuteReportValues]]: a VALUES literal — the flagship's seeded
  *    generator (reference at its published 5,805-event scale) pivots to a
  *    fixed 5-row table, committed inline.
  *  - [[parquet]]: a dispatch query over Spark-computed golden parquets in
  *    `/root/repo/golden/` (one per scale factor, produced by
  *    `graft.Verify` and frozen — the round-6 verdict's "Spark-computed
  *    golden parquet" mechanism). The sf is identified from inside the
  *    oracle SQL by `(SELECT count(*) FROM events)` — 1 000 / 10 000 /
  *    100 000 at sf0.001/0.01/0.1 — since check_oracle registers only the
  *    current sf's tables.
  *
  * HONESTY CONTRACT: a golden oracle pins run-to-run determinism and
  * regressions, NOT first-principles correctness — that lives in each
  * operator's ScalaTest ground-truth spec (planted duplicates, exact
  * recall, codec round-trips). Only queries empirically shown
  * run-over-run deterministic (two independent Verify sessions,
  * bit-identical output — see SURVEY §8) may be golden-pinned: a
  * nondeterministic query would turn a soft `no_oracle` into a hard red.
  */
object Golden {

  /** Absolute because DuckDB resolves paths relative to its own cwd.
    * Overridable (`-Dgraft.golden.root` / `GRAFT_GOLDEN_ROOT`) so a clone
    * at any other path can still serve the committed goldens. */
  val Root: String = sys.props.get("graft.golden.root")
    .orElse(sys.env.get("GRAFT_GOLDEN_ROOT"))
    .getOrElse("/root/repo/golden")

  private val SfEvents = Map(
    "sf0.001" -> 1000L, "sf0.01" -> 10000L, "sf0.1" -> 100000L)

  /** The sf-dispatched golden relation (INCLUDING `__row`) as a subquery,
    * for embedding in larger oracle SQL — the building block of the
    * "invariant twin" oracles below (round-7 verdict "Next round" #2). */
  def dispatch(name: String,
      sfs: Seq[String] = Seq("sf0.001", "sf0.01", "sf0.1")): String =
    sfs.map { sf =>
      s"""SELECT * FROM read_parquet('$Root/$sf/$name.parquet')
         |WHERE (SELECT count(*) FROM events) = ${SfEvents(sf)}""".stripMargin
    }.mkString("", "\nUNION ALL\n", "")

  /** Dispatch oracle: serve the committed golden for whichever sf the
    * checker registered. Goldens carry a `__row` column freezing the
    * Spark query's exact row order (the checker compares row-by-row), so
    * the oracle re-serves that order explicitly instead of trusting scan
    * order, then drops the bookkeeping column to match the live schema.
    * `sfs` lists the scale factors a golden exists for (any other sf
    * fails loudly — zero golden rows vs a nonempty Spark result). */
  def parquet(name: String,
      sfs: Seq[String] = Seq("sf0.001", "sf0.01", "sf0.1")): String =
    s"SELECT * EXCLUDE (__row) FROM (\n${dispatch(name, sfs)}\n) g ORDER BY __row"

  // ---------------------------------------------------------------------
  // Invariant twins (round-7 verdict "Next round" #2): where a golden's
  // VALUES are recomputable from the base tables, the oracle recomputes
  // them in DuckDB instead of re-serving the engine's frozen output — a
  // bug frozen into the pin at golden time now fails the hard gate. The
  // golden keeps pinning SELECTION and ORDER (which rows, which sequence);
  // every recomputable value column comes from DuckDB's own arithmetic
  // over documents/embeddings/events/lineitem. Verified bit-agreeing at
  // all three sfs before adoption (cosines: DuckDB list_dot_product over
  // DOUBLE[] accumulates left-to-right in double exactly like
  // DotProductExpr.nullSafeEval/doGenCode).
  // ---------------------------------------------------------------------

  /** DuckDB-side exact cosine vs query vector vec_id=0, recomputed from
    * the embeddings table for the golden's returned ids. */
  def knnCosRecomputed(name: String): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |g AS (${dispatch(name)})
       |SELECT g.vec_id, e.label,
       |       round(list_dot_product(e.v, q.qv) /
       |             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
       |FROM g JOIN e USING (vec_id) CROSS JOIN q ORDER BY g.__row""".stripMargin

  /** Invariant twin for QUANTIZED kNN scores (PQ ADC, SQ8): the score is
    * approximate by construction and cannot be recomputed exactly in SQL,
    * but it must sit within `eps` of the true cosine DuckDB recomputes
    * from the embeddings table — a violating score collapses to -1 and
    * hash-mismatches. `eps` is sized from the quantizer's observed error
    * at all three sfs with ~50% headroom (PQ ADC max 0.162 → 0.25; SQ8
    * max 0.0018 → 0.01); the label column is independently re-fetched. */
  def knnApproxGuarded(name: String, scoreCol: String, eps: Double): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |g AS (${dispatch(name)})
       |SELECT g.vec_id, e.label,
       |       CASE WHEN abs(g.$scoreCol - list_dot_product(e.v, q.qv) /
       |              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))) <= $eps
       |            THEN g.$scoreCol ELSE -1 END AS $scoreCol
       |FROM g JOIN e USING (vec_id) CROSS JOIN q ORDER BY g.__row""".stripMargin

  /** Fully-independent brute-force top-10 cosine oracle: DuckDB computes
    * the ids AND the values from the embeddings table alone — no golden
    * involved. Orders by the rounded cosine with the vec_id tiebreak,
    * exactly the engine's sort key. */
  def knnExactTopK(withLabel: Boolean): String = {
    val label = if (withLabel) " e.label," else ""
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT e.vec_id,$label
       |       round(list_dot_product(e.v, q.qv) /
       |             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
       |FROM e CROSS JOIN q WHERE e.vec_id != 0
       |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin
  }

  /** Pivot of the seeded 5,805-event flagship generation (deterministic:
    * seed, rate, and error probability are all pinned — EventsGenSpec).
    * Regenerate by running `ref_minute_report` and dumping the 5 rows. */
  val refMinuteReportValues: String =
    """SELECT event_type, CAST(c_err AS BIGINT) AS ERROR,
      |       CAST(c_suc AS BIGINT) AS SUCCESS
      |FROM (VALUES
      |  ('ADD_TO_CART',  270, 873),
      |  ('CHECKOUT',     257, 881),
      |  ('PAYMENT',      266, 903),
      |  ('SEARCH',       264, 893),
      |  ('VIEW_PRODUCT', 288, 910)
      |) AS t(event_type, c_err, c_suc)
      |ORDER BY event_type""".stripMargin
}

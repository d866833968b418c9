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

  /** Dispatch oracle: serve the committed golden for whichever sf the
    * checker registered. Goldens carry a `__row` column freezing the
    * Spark query's exact row order (the checker compares row-by-row), so
    * the oracle re-serves that order explicitly instead of trusting scan
    * order, then drops the bookkeeping column to match the live schema.
    * `sfs` lists the scale factors a golden exists for (any other sf
    * fails loudly — zero golden rows vs a nonempty Spark result). */
  def parquet(name: String,
      sfs: Seq[String] = Seq("sf0.001", "sf0.01", "sf0.1")): String = {
    val branches = sfs.map { sf =>
      s"""SELECT * FROM read_parquet('$Root/$sf/$name.parquet')
         |WHERE (SELECT count(*) FROM events) = ${SfEvents(sf)}""".stripMargin
    }.mkString("", "\nUNION ALL\n", "")
    s"SELECT * EXCLUDE (__row) FROM (\n$branches\n) g ORDER BY __row"
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

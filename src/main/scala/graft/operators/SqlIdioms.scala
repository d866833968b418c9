package graft.operators

/** Portability idioms for the GENERATED DuckDB oracle SQL.
  *
  * The driver's gate replays every query in whatever DuckDB build it
  * ships; the engine's integer arithmetic is Scala/Spark int64. Two
  * cross-build hazards bit us in round 9 (CORRECTNESS_r09:
  * quality_lr_train / quality_lr_score, root-caused in VERDICT.md §What's
  * wrong #1) and are neutralized here once, for every oracle:
  *
  *  1. '''HUGEINT widening''': DuckDB types `sum(BIGINT)` as HUGEINT, so
  *     any arithmetic downstream of a SUM silently runs in 128-bit. That
  *     is usually benign — until it meets hazard 2.
  *  2. '''floor-vs-truncate `//`''': Scala's `Long./` (and Spark's `div`)
  *     truncate toward zero; DuckDB's integer `//` truncates in some
  *     builds and FLOORS in others (observed: local 1.0.0 truncates
  *     HUGEINT, the driver's newer build floors it). For a NEGATIVE
  *     non-divisible numerator the two differ by exactly 1 unit — enough
  *     to flip a fixed-point weight chain bit-for-bit.
  *
  * [[tdivSql]] emits division that truncates toward zero under EITHER
  * semantics; callers should also `CAST(sum(...) AS BIGINT)` at the
  * aggregate so the replay stays in int64 like the engine. OracleSqlSpec
  * greps every generated oracle for bare `//` over a negative-capable
  * numerator to keep the class closed.
  */
object SqlIdioms {

  /** Truncating integer division `n / d` (toward zero), portable across
    * DuckDB builds that floor `//` and builds that truncate it. `d` must
    * be positive (every oracle divisor here is a count or a power of
    * two). For `n >= 0` floor and truncate agree; for `n < 0` we divide
    * the negated (positive) numerator and negate back. */
  def tdivSql(n: String, d: String): String =
    s"(CASE WHEN $n >= 0 THEN $n // $d ELSE -((-($n)) // $d) END)"
}

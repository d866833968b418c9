package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the DuckDB-build portability of every `//` in the GENERATED
  * oracle SQL — the round-9 red-gate class (VERDICT r9 "What's wrong" #1:
  * `quality_lr_train`/`quality_lr_score` flipped when the driver's DuckDB
  * floored a negative HUGEINT division that the engine truncates).
  *
  * Floor and truncate only disagree on a NEGATIVE non-divisible
  * numerator, so each `//` site must be one of:
  *  - the [[graft.operators.SqlIdioms.tdivSql]] idiom (CASE-guarded so
  *    both branches divide a nonnegative numerator — portable by
  *    construction), or
  *  - in the audited allowlist below of numerator SHAPES proven
  *    nonnegative (counts, abs-sums, prices, ids, pagerank mass, …).
  *
  * Any NEW `//` in an oracle fails here until its numerator shape is
  * audited and added — the "conscious audit" gate VERDICT r9 asked for.
  * Pure string analysis; no Spark session.
  */
class OracleDivisionSpec extends AnyFunSuite {

  /** Replace single-quoted SQL string literals ('' = escaped quote) so a
    * literal like 'https://…' is not mistaken for integer division. */
  private def stripStrings(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (sql(i) == '\'') {
        var j = i + 1
        var open = true
        while (j < sql.length && open) {
          if (sql(j) == '\'') {
            if (j + 1 < sql.length && sql(j + 1) == '\'') j += 2
            else open = false
          } else j += 1
        }
        out ++= "'S'"
        i = j + 1
      } else { out += sql(i); i += 1 }
    }
    out.toString
  }

  /** Matches the exact text [[graft.operators.SqlIdioms.tdivSql]] emits. */
  private val TdivIdiom =
    """(?s)\(CASE WHEN (.+?) >= 0 THEN .+? // (.+?) ELSE -\(\(-\(.+?\)\) // .+?\) END\)""".r

  private def removeIdioms(sql: String): (String, Int) = {
    var s = sql
    var total = 0
    var changed = true
    while (changed) {
      val n = TdivIdiom.findAllMatchIn(s).length
      changed = n > 0
      total += n
      if (changed) s = TdivIdiom.replaceAllIn(s, " TDIV ")
    }
    (s, total)
  }

  /** Left operand of the `//` at `pos`: balanced-paren backward scan. */
  private def numeratorAt(sql: String, pos: Int): String = {
    var i = pos - 1
    while (i >= 0 && (sql(i) == ' ' || sql(i) == '\n' || sql(i) == '\t')) i -= 1
    val end = i + 1
    var depth = 0
    var stop = -1
    while (i >= 0 && stop < 0) {
      sql(i) match {
        case ')' => depth += 1
        case '(' =>
          depth -= 1
          if (depth < 0) stop = i
        case ',' | ';' if depth == 0 => stop = i
        case '/' if depth == 0 && i > 0 && sql(i - 1) == '/' => stop = i - 1
        case _ =>
      }
      i -= 1
    }
    sql.substring(math.max(stop + 1, 0), end).trim
  }

  private def shapeOf(num: String): String =
    num.replaceAll("\\s+", " ").replaceAll("\\d+", "N")

  /** Numerator shapes audited nonnegative (2026-08-14 round-10 sweep of
    * all 233 oracles). Floor == truncate for nonnegative numerators, so
    * these sites cannot flip across DuckDB builds. */
  private val AuditedNonNegative = Set(
    "((max(n) + N) // N) * N",              // mm_audio_resample: sample count
    "(-CAST(sum(lnp_micro) AS BIGINT))",    // bigram ppl: lnp_micro <= 0 always (log-prob), so -sum >= 0
    "(CAST(round(sum(value) * N) AS BIGINT) * N + count(*))", // ev_user_stats: events.value in [0.01, 490] by generator
    "(N * (N // n.n))",                     // pagerank teleport: positive literal / node count
    "(N * CAST(c AS BIGINT))",              // kmeans purity: group count
    "(N * p.n_ab)",                         // mba support/confidence: pair co-occurrence count >= 1
    "(N * sum(w * cents))",                 // bootstrap replicate mean: Poisson weights >= 0, cents = round(value*100) >= 1 (value in [0.01, 490] by generator)
    "sum(mean_eN)",                         // bootstrap mean of means: each replicate mean >= 0
    "SELECT (runmax - us)",                 // watermark lateness: running max over arrivals >= own event time by definition
    "(N * len(list_filter(string_split(text, 'S'), t -> t IN ('S','S'))))", // conformal micro ratio: token counts >= 0 (negation happens AFTER the div)
    "(N * (count(*) + N) + N)",             // conformal k = ceil((1-alpha)(n+1)): counts and positive literals
    "(N * sum(CASE WHEN test.nonconf <= thr.threshold THEN N ELSE N END))", // conformal coverage: 0/1 indicator sum
    "(N * p.n_ab * nb.n)",                  // mba lift: pair count x basket count, both >= 1
    "(N * s.ssum)",                         // seasonal mean: sum of hourly counts
    "(N * sum(abs(cum_c * t.n_tot - cum_g * n_class)))", // t-closeness EMD: abs-sum
    "((p.t - r.mn) * N)",                   // lttb/m4 bucketing: t >= per-series min by construction of rng
    "(max(c) * N + sum(c) - N)",            // salt plan ceil-div: c = group counts >= 1, P = 32, so max*P + sum - 1 >= 32
    "(max_key_out * N + out_rows - N)",     // join plan ceil-div: both are sums/maxes of count products >= 0, and the branch guards out_rows > 0, so numerator >= 0*32 + 1 - 1 = 0
    "(max(n) + N)",                         // mm_audio_resample: sample count
    "(sum(CAST(round(l_extendedprice * N) AS BIGINT) * CAST(round((N.N - l_discount) * N) AS BIGINT)) + N)", // q7 revenue: price >= 0, discount <= 1
    "/ (N * n.ns) ELSE N END + (N * COALESCE(cN.contrib, N))", // PPR rank mass: nonneg
    "/ N + (N * COALESCE(cN.contrib, N))",  // pagerank rank mass: nonneg
    "CASE WHEN g.n_sampled = (g.n_frames + N)", // frame sample: counts
    "CASE WHEN nodes.node % N = N THEN (N * N)", // PPR seed teleport: positive literal
    "DISTINCT n_chars",                     // l-diversity: count distinct
    "N",                                    // positive literals
    "SELECT (doc_id * N)",                  // heaps law: doc_id >= 0
    "i",                                    // audio frame index >= 1
    "max(n) * N",                           // audio: sample count
    "n_chars",                              // char count
    "(n + N)",                              // set-sim prefix length ceil: n = shingle-set size >= 1
    "SELECT (n + N)",                       // datasheet median target ceil(n/2): n = doc count >= 1
    "(N * (SELECT max(c) FROM (SELECT count(*) AS c FROM documents GROUP BY coalesce(lang, 'S'))))",   // datasheet top-lang share: a group count (NULL-coalesced census bucket, still a count >= 1)
    "(N * (SELECT max(c) FROM (SELECT count(*) AS c FROM documents GROUP BY coalesce(source, 'S'))))", // datasheet top-source share: a group count (NULL-coalesced census bucket, still a count >= 1)
    "(N * ((SELECT n FROM base) - count(DISTINCT text)))", // datasheet exact-dup rate: distinct texts can never exceed the doc count
    "(N * (SELECT count(*) FROM gc))",      // datasheet near-dup rate: cluster-member count
    "s",                                    // datasheet mean novelty: sum of per-doc novelty_e6, each in [0, 1e6]
    "(N * (count(*) - sum(CASE WHEN df >= N THEN N ELSE N END)))", // gram novelty: the 0/1 shared-gram sum can never exceed the gram count it sums over
    "(N * n_inter)",                        // set-sim jaccard_e6: intersection count >= 1 (acceptance requires 3*inter >= n_a+n_b > 0)
    "p.r",                                  // pagerank mass: nonneg invariant
    "SELECT n",                             // ann panel stride n//32: n = count(*) of embeddings >= 0 (tune + recall_report)
    "(N * sum(hits))",                      // recall mean: hits = per-query hit counts in [0, 10]
    "(N * (SELECT max(c) FROM (SELECT count(*) AS c FROM documents GROUP BY coalesce(lang, chr(N)))))",   // datasheet top-lang share after the U+0001 sentinel move: still a group count >= 1
    "(N * (SELECT max(c) FROM (SELECT count(*) AS c FROM documents GROUP BY coalesce(source, chr(N)))))") // datasheet top-source share: same

  test("every // site in generated oracle SQL is floor/trunc-portable") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql) {
      val (clean, _) = removeIdioms(stripStrings(sql))
      var from = clean.indexOf("//")
      while (from >= 0) {
        val shape = shapeOf(numeratorAt(clean, from))
        if (!AuditedNonNegative.contains(shape))
          offenders += s"$name: unaudited // numerator shape: $shape"
        from = clean.indexOf("//", from + 2)
      }
    }
    assert(offenders.isEmpty, offenders.distinct.mkString(
      "\nNew // sites in oracle SQL must divide a provably nonnegative " +
        "numerator (then add the shape here with a why-nonneg comment) " +
        "or use SqlIdioms.tdivSql:\n", "\n", "\n"))
  }

  test("the round-9 red-gate queries carry the tdiv idiom") {
    val mustHaveIdiom = Seq("quality_lr_train", "quality_lr_score",
      "quality_agreement_kappa", "sim_kmeans_assign", "sim_kmeans_purity",
      "ev_seasonal_decompose", "ev_seasonal_anomaly")
    for (name <- mustHaveIdiom) {
      val (_, n) = removeIdioms(stripStrings(SparkEntry.oracleSql(name)))
      assert(n > 0, s"$name lost its tdiv idiom — negative-numerator " +
        "division would flip on floor-// DuckDB builds")
    }
  }

  test("gradient sums in the LR oracle are CAST back to BIGINT") {
    // sum(BIGINT) is HUGEINT in DuckDB; uncast it silently widens the
    // whole weight chain to 128-bit (round-9 failure ingredient #1).
    for (name <- Seq("quality_lr_train", "quality_lr_score")) {
      val sql = SparkEntry.oracleSql(name)
      val uncast = "(?<!CAST\\()COALESCE\\(sum\\(CASE WHEN pre".r
        .findAllIn(sql).length
      assert(uncast == 0,
        s"$name: $uncast gradient sum(s) not wrapped in CAST(... AS BIGINT)")
      assert(sql.contains("CAST(COALESCE(sum(CASE WHEN pre"))
    }
  }
}

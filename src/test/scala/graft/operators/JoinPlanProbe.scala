package graft.operators

import org.apache.spark.sql.functions._

/** Scale probe for the join-strategy advisor (`audit_join_plan` /
  * [[Audit.joinPlanFor]]): is the census pre-pass actually CHEAP relative
  * to the join it advises on, at a scale where the advice matters?
  *
  * Fixture mirrors SkewStress's planted hub: a 100M-row fact side where
  * 30% of rows carry ONE hot key (the shape byte-based AQE skew detection
  * missed in Leg 14), joined to a 1M-row dim side where the hot key is
  * many-to-many (8 dim rows) — so the join output amplifies and the hot
  * key's output share is ~30%·8 of the whole join.
  *
  * Measured: (a) advisor wall time (both censuses + full-outer census
  * join + 1-row readout), (b) the real join's count(*) wall time at
  * defaults, (c) exactness — advisor out_rows must equal the real join's
  * count. Findings land in SCALE_NOTES Leg 25.
  *
  *   sbt "Test/runMain graft.operators.JoinPlanProbe"
  *   JP_ROWS=10000000 sbt "Test/runMain ..."   # quicker iteration
  */
object JoinPlanProbe {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("JP_ROWS", "100000000").toLong
    val dimN = math.max(n / 100, 1000L)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    // fact: 30% hot key, rest uniform over dimN keys
    def fact = spark.range(n).select(
      when($"id" % 10 < 3, lit("hot"))
        .otherwise(concat(lit("k"), pmod(xxhash64($"id"), lit(dimN)).cast("string")))
        .as("key"))
    // dim: every uniform key once, hot key 8x (many-to-many hub)
    def dim = spark.range(dimN)
      .select(concat(lit("k"), $"id".cast("string")).as("key"))
      .unionByName(spark.range(8).select(lit("hot").as("key")))

    def timed[T](what: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $what%-24s $sec%8.2f s")
      (r, sec)
    }

    // discard rep then 3 timed reps of each, interleaved
    timed("advisor (discard)")(Audit.joinPlanFor(fact, dim, "probe").collect())
    timed("real join (discard)")(fact.join(dim, "key").count())
    val adv = (1 to 3).map(_ =>
      timed("advisor")(Audit.joinPlanFor(fact, dim, "probe").collect())._2)
    val real = (1 to 3).map(_ => timed("real join")(fact.join(dim, "key").count()))
    val joinCnt = real.head._1
    val advisorRow = Audit.joinPlanFor(fact, dim, "probe").collect().head

    val outRows = advisorRow.getAs[Long]("out_rows")
    println(s"[probe] rows=$n dim=$dimN advisor_out_rows=$outRows real_join_count=$joinCnt")
    assert(outRows == joinCnt, "advisor census must equal the real join size")
    println(s"[probe] advisor says: strategy=${advisorRow.getAs[String]("strategy")} " +
      s"needs_salt=${advisorRow.getAs[Boolean]("needs_salt")} " +
      s"salt_factor=${advisorRow.getAs[Long]("recommended_salt_factor")} " +
      s"max_key_out=${advisorRow.getAs[Long]("max_key_out")} " +
      s"amplification=${advisorRow.getAs[Double]("amplification")}")
    val advMed = adv.sorted.apply(1)
    val realMed = real.map(_._2).sorted.apply(1)
    println(f"[probe] median advisor ${advMed}%.2f s vs real join ${realMed}%.2f s " +
      f"(advisor = ${100 * advMed / realMed}%.0f%% of the join it advises on)")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._

/** Ad-hoc probe: trailing-window distinct users at 10M events — the
  * sketch-rollup fan-out path (ev_hll_trailing_7d's shape) vs the naive
  * per-window COUNT(DISTINCT) recompute that re-scans every raw event
  * once per window it belongs to. Run manually; result recorded in
  * SCALE_NOTES (Leg 28) + the Hll.hllTrailingUsers scaladoc. */
object TrailingWauProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val days = 30
    val win = 7
    // n events over `days` days, zipf-ish user draw over 2M ids so the
    // daily distinct count is deep in the HLL estimation regime
    val ev = spark.range(n).select(
      (col("id") % days).cast("int").as("day_i"),
      pmod(xxhash64(col("id")), lit(2000000L)).as("user_id"))
      .withColumn("day", date_format(
        date_add(lit("2024-01-01").cast("date"), col("day_i")), "yyyy-MM-dd"))
      .drop("day_i")
    ev.write.mode("overwrite").parquet("/tmp/wau_probe")
    val raw = spark.read.parquet("/tmp/wau_probe")

    // rollup build (the pass a nightly job already pays)
    var t0 = System.nanoTime()
    raw.groupBy($"day")
      .agg(hll_sketch_agg($"user_id").as("sk"), count(lit(1)).as("events"))
      .write.mode("overwrite").parquet("/tmp/wau_rollup")
    val tBuild = (System.nanoTime() - t0) / 1e9

    // trailing windows FROM the rollup: cells fan out, bytes shuffle
    val cells = spark.read.parquet("/tmp/wau_rollup")
    t0 = System.nanoTime()
    val served = cells
      .withColumn("off", explode(sequence(lit(0), lit(win - 1))))
      .withColumn("wday", date_format(date_add(to_date($"day"), $"off"), "yyyy-MM-dd"))
      .join(broadcast(cells.select($"day".as("wday"))), Seq("wday"), "left_semi")
      .groupBy($"wday")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("wau"))
      .collect()
    val tServe = (System.nanoTime() - t0) / 1e9

    // naive: every raw event joins into each of its <=7 windows, then
    // exact COUNT(DISTINCT) per window — the shape the rollup replaces
    t0 = System.nanoTime()
    val naive = raw
      .withColumn("off", explode(sequence(lit(0), lit(win - 1))))
      .withColumn("wday", date_format(date_add(to_date($"day"), $"off"), "yyyy-MM-dd"))
      .join(broadcast(raw.select($"day".as("wday")).distinct()), Seq("wday"), "left_semi")
      .groupBy($"wday")
      .agg(countDistinct($"user_id").as("wau"))
      .collect()
    val tNaive = (System.nanoTime() - t0) / 1e9

    val exact = naive.map(r => r.getString(0) -> r.getLong(1)).toMap
    val worst = served.map { r =>
      val e = exact(r.getString(0))
      math.abs(r.getLong(1) - e).toDouble / e
    }.max
    println(f"[wauprobe] n=$n days=$days win=$win build=$tBuild%.2f s " +
      f"serve=$tServe%.2f s naive=$tNaive%.2f s worst_rel_err=$worst%.4f")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._

/** Scale probe for the prefix-filtered exact set-similarity join
  * (Dedup.setSimilarityJoin): at a corpus 20x the sweep SF, measure the
  * candidate volume the prefix index generates vs the Sum(df^2)
  * inverted-index self-join it replaces and vs brute-force all-pairs,
  * plus wall time against the MinHash-LSH approximate path on the SAME
  * corpus (the exact-vs-approx tradeoff a curation pipeline chooses
  * between).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.operators.SetSimScaleProbe"
  */
object SetSimScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val nBase = sys.env.getOrElse("SETSIM_BASE", "80000").toInt
    val nDup = sys.env.getOrElse("SETSIM_DUP", "20000").toInt
    val dir = java.nio.file.Files.createTempDirectory("setsim-scale").toString

    // corpus: nBase unique docs of 40-80 seeded-random vocab words, plus
    // nDup near-dups (a base doc with its last 6 words rewritten —
    // shingle Jaccard ~0.8, above the t=1/2 acceptance line)
    val base = spark.range(0, nBase).select(
      $"id".as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(1, 40 + int(xxhash64(id, 'len') % 41)),
             |  i -> concat('w', abs(xxhash64(id, i) % 50000))))""".stripMargin)
        .as("text"))
    val dups = spark.range(0, nDup).select(
      ($"id" + 10000000L).as("doc_id"),
      expr(s"""concat_ws(' ',
              |  concat_ws(' ', slice(split((
              |    concat_ws(' ', transform(sequence(1, 40 + int(xxhash64(id % $nBase, 'len') % 41)),
              |      i -> concat('w', abs(xxhash64(id % $nBase, i) % 50000))))), ' '), 1, 34)),
              |  concat_ws(' ', transform(sequence(1, 6), i -> concat('m', abs(xxhash64(id, i, 'mut') % 50000)))))""".stripMargin)
        .as("text"))
    base.unionByName(dups)
      .select($"doc_id", $"text", lit("en").as("lang"), lit("s").as("source"),
        length($"text").cast("long").as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    val n = nBase + nDup
    println(s"[setsim] corpus: $n docs ($nBase base + $nDup near-dups)")

    // volumes: full inverted-index self-join vs the rare-first prefix index
    val tok = graft.Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        """transform(sequence(0, greatest(size(ws) - 3, 0)),
          |          i -> concat_ws(' ', slice(ws, i + 1, 3)))""".stripMargin)).as("sh"))
      .distinct()
    val fullVol = tok.groupBy($"sh").agg(count(lit(1)).as("df"))
      .agg(expr("sum(df * (df - 1) div 2)")).head().getLong(0)
    val sizes = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val prefVol = {
      import org.apache.spark.sql.expressions.Window
      val dfq = tok.groupBy($"sh").agg(count(lit(1)).as("df"))
      tok.join(dfq, "sh").join(sizes, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"df", $"sh")))
        .filter($"rn" <= $"n" - (($"n" + 1) / 2).cast("long") + 1)
        .groupBy($"sh").agg(count(lit(1)).as("df"))
        .agg(expr("sum(df * (df - 1) div 2)")).head().getLong(0)
    }
    val brute = n.toLong * (n - 1) / 2
    println(f"[setsim] pair volumes: brute=$brute%,d  inverted-index=$fullVol%,d  prefix-index=$prefVol%,d (${fullVol.toDouble / prefVol}%.1fx less than inverted, ${brute.toDouble / prefVol}%.1fx less than brute)")

    // distinct candidate PAIRS before vs after the positional filter —
    // the PPJoin tightening measured on its own
    val dfq2 = tok.groupBy($"sh").agg(count(lit(1)).as("df"))
    val pref = {
      import org.apache.spark.sql.expressions.Window
      tok.join(dfq2, "sh").join(sizes, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"df", $"sh")))
        .filter($"rn" <= $"n" - (($"n" + 1) / 2).cast("long") + 1)
        .select($"doc_id", $"sh", $"n", $"rn")
    }
    val joined = pref.select($"doc_id".as("doc_a"), $"sh", $"n".as("n_a"), $"rn".as("ra"))
      .join(pref.select($"doc_id".as("doc_b"), $"sh", $"n".as("n_b"), $"rn".as("rb")), "sh")
      .filter($"doc_a" < $"doc_b")
      .filter($"n_b" * 2 >= $"n_a" && $"n_a" * 2 >= $"n_b")
      .withColumn("ub", least($"ra", $"rb") + least($"n_a" - $"ra", $"n_b" - $"rb"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b").agg(min($"ub").as("ub"))
    val prePos = joined.count()
    val postPos = joined.filter($"ub" * 3 >= $"n_a" + $"n_b").count()
    println(f"[setsim] candidate pairs: pre-positional=$prePos%,d  post-positional=$postPos%,d (${prePos.toDouble / math.max(postPos, 1)}%.1fx)")

    val (rows, tExact) = timed(Dedup.setSimilarityJoin(spark, dir).count())
    println(f"[setsim] exact prefix-filtered join: $rows%,d pairs in $tExact%.1f s")

    val (lshRows, tLsh) = timed(Dedup.ngramJaccardPairs(spark, dir).count())
    println(f"[setsim] MinHash-LSH + exact-verify path (verifiedPairs build, top-20 readout $lshRows rows): $tLsh%.1f s")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.reference.Events
import graft.sources.Warehouse

/** Manual scale stress (run: sbt "Test/runMain graft.operators.ScaleStress").
  * Results recorded in SCALE_NOTES.md. Exercises the two legs that must
  * survive 100 TB: the event warehouse at 100× the sf0.1 event volume, and
  * the near-dup pipeline on a 100k-doc corpus with KNOWN ground truth
  * (19 mutated replicas per original → recall is measurable).
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // ---- leg 1: 10M events (100× sf0.1's events table) through the warehouse
    val wh = java.nio.file.Files.createTempDirectory("stress-wh").toString
    val events = Events.generate(spark, 10_000_000L, 1704067200000L, intervalMs = 10)
    time("warehouse write 10M events (1667 minute partitions)") {
      Warehouse.writeEvents(events, wh)
    }
    val nParts = new java.io.File(wh).listFiles().count(_.getName.startsWith("event_minute="))
    println(s"[stress] partitions: $nParts")
    time("pruned single-minute read + pivot report") {
      val m = java.sql.Timestamp.valueOf("2024-01-01 02:00:00")
      val r = graft.reference.MinuteReport.analyze(
        Warehouse.readMinute(spark, wh, m), "stress.parquet")
      require(r.totalEvents == 6000, s"got ${r.totalEvents}")
    }
    time("full-warehouse minute×type aggregation (10M rows)") {
      Warehouse.readEvents(spark, wh)
        .groupBy($"event_minute", $"event_type").count().count()
    }

    // ---- leg 2: near-dup on 100k docs with ground truth
    val d = "/root/testdata/sf0.1"
    val corpus = Tables.documents(spark, d)
      .select($"doc_id", explode(expr("sequence(0, 19)")).as("rep"), $"text")
      .select(
        ($"doc_id" * 20 + $"rep").as("doc_id"),
        // ~10% deterministic token dropout per replica -> near-duplicates
        expr("""array_join(filter(split(text, ' '),
               |          t -> pmod(xxhash64(t, rep), 10) != 0), ' ')""".stripMargin)
          .as("text"))
    val n = time("corpus materialize")(corpus.cache().count())
    println(s"[stress] corpus docs: $n")
    val cands = time("minhash-LSH candidate pairs on 100k docs") {
      val sh = corpus.filter(size(split($"text", " ")) >= 3)
        .select($"doc_id", expr(
          """array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
            |               i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))"""
            .stripMargin).as("sh"))
      val sigs = Dedup.withMinhashSig(sh).select($"doc_id", $"sig").persist()
      val banded = sigs.select($"doc_id",
          explode(expr(
            s"""transform(sequence(0, ${Dedup.LshBands - 1}),
               |          b -> named_struct('band', b, 'key', xxhash64(slice(sig, b * ${Dedup.LshRows} + 1, ${Dedup.LshRows}))))"""
              .stripMargin)).as("bk"))
        .select($"doc_id", $"bk.band", $"bk.key")
      val small = banded.groupBy($"band", $"key")
        .agg(count(lit(1)).as("n")).filter($"n" <= 500).select($"band", $"key")
      val pruned = banded.join(small, Seq("band", "key"))
      val a = pruned.select($"band", $"key", $"doc_id".as("doc_a"))
      val b = pruned.select($"band", $"key", $"doc_id".as("doc_b"))
      a.join(b, Seq("band", "key")).filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b").dropDuplicates("doc_a", "doc_b")
        .cache()
    }
    val total = cands.count()
    val sameOrigin = cands.filter(($"doc_a" / 20).cast("long") === ($"doc_b" / 20).cast("long")).count()
    println(s"[stress] candidate pairs: $total, same-origin (true near-dups): $sameOrigin")
    // ground truth: 5000 origins × C(20,2) = 950_000 true near-dup pairs
    println(f"[stress] recall of true near-dup pairs: ${sameOrigin / 950000.0}%.3f, precision: ${sameOrigin.toDouble / total}%.3f")

    // ---- leg 3: ANN recall at 100k vectors (20 perturbed replicas per base)
    val emb = Tables.embeddings(spark, d)
      .select($"vec_id", explode(expr("sequence(0, 19)")).as("rep"), $"embedding")
      .select(($"vec_id" * 20 + $"rep").as("vec_id"),
        expr("""transform(embedding,
               |  (x, i) -> cast(x + (pmod(xxhash64(vec_id, rep, i), 100) - 50) / 2500.0 as float))"""
          .stripMargin).as("embedding"))
      .cache()
    println(s"[stress] vectors: ${emb.count()}")
    import graft.functions.VectorOps._
    val qv: Seq[Float] = emb.filter($"vec_id" === 0L).head().getSeq[Float](1).toArray.toSeq
    val q = typedlit(qv)
    val exact = time("brute-force top-20 over 100k vectors") {
      emb.filter($"vec_id" =!= 0L)
        .select($"vec_id", cosine($"embedding", q).as("cos"))
        .orderBy($"cos".desc, $"vec_id").limit(20).collect().map(_.getLong(0)).toSet
    }
    // same-origin replicas of query vec 0 should dominate the true top-20
    println(s"[stress] true top-20 same-origin share: ${exact.count(_ / 20 == 0)}/20")

    // ---- leg 4: AQE skew-join handling on a deliberately hot key
    val hot = spark.range(0, 5_000_000L).select(
      when($"id" % 100 === 0, 0L).otherwise($"id").as("k"), $"id".as("v"))
    val dim = spark.range(0, 1_000_000L).select($"id".as("k"), ($"id" * 2).as("w"))
    val joined = hot.join(dim, "k")
    time("5M-row join with 1 hot key (AQE skew handling on)") {
      println(s"[stress] joined rows: ${joined.count()}")
    }
    spark.stop()
  }
}

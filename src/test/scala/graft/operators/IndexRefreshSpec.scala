package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Incremental ANN/BM25 index refresh (round-7 verdict "Next round" #4):
  * after a corpus append, `refreshIvfIndex`/`refreshLshIndex`/
  * `refreshPostingsIndex` must (a) produce an index EQUAL to a full
  * rebuild over the grown corpus (label-identical for IVF given its frozen
  * quantizer; score-identical to the from-scratch scan for BM25), while
  * (b) leaving every pre-existing index file byte-untouched — the
  * refresh's cost is ∝ |delta|, which is the whole point at 100 TB. */
class IndexRefreshSpec extends SparkSuite {

  private val SfSmall = "/root/testdata/sf0.001"

  /** (relative path → size) of every data file under `dir` — refresh must
    * only ADD to this set, never modify or remove. Underscore-prefixed
    * bookkeeping (completion marker, _SUCCESS, _centroids) is excluded:
    * the marker is re-stamped and _SUCCESS is rewritten by design. */
  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).toSeq.flatten
        .filterNot(_.getName.startsWith("_")).flatMap(walk)
    walk(new java.io.File(dir))
      .map(f => f.getPath.stripPrefix(dir) -> f.length).toMap
  }

  /** A corpus dir whose tables are Spark-written DIRECTORIES (the sf
    * fixtures are single files — nothing can append to them), split into
    * a base and a held-out delta. */
  private def splitCorpus(): (String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val corpus = tmpDir("refresh-corpus")
    val emb = Tables.embeddings(spark, SfSmall)
    val docs = Tables.documents(spark, SfSmall)
    emb.filter($"vec_id" < 400).write.parquet(s"$corpus/embeddings.parquet")
    docs.filter($"doc_id" < 400).write.parquet(s"$corpus/documents.parquet")
    (corpus, emb.filter($"vec_id" >= 400), docs.filter($"doc_id" >= 400))
  }

  test("IVF refresh ≡ full rebuild with the same quantizer; old files untouched") {
    import spark.implicits._
    val (corpus, deltaVecs, _) = splitCorpus()
    val idx = Similarity.ivfIndexDir(spark, corpus)
    val before = dataFiles(idx)
    // the corpus grows...
    deltaVecs.write.mode("append").parquet(s"$corpus/embeddings.parquet")
    // ...and the index follows incrementally
    val idx2 = Similarity.refreshIvfIndex(spark, corpus, deltaVecs)
    val after = dataFiles(idx2)
    assert(before.forall { case (p, n) => after.get(p).contains(n) },
      "refresh must not modify or remove any pre-existing index file")
    assert(after.size > before.size, "refresh must have appended delta files")
    // label-identity: the refreshed index equals a from-scratch assignment
    // of the WHOLE grown corpus against the index's own stored centroids
    val cents = Similarity.indexCentroids(spark, idx2)
    val scratch = tmpDir("refresh-scratch")
    Similarity.writeIvfCells(
      Tables.embeddings(spark, corpus), cents, scratch, "overwrite")
    def labels(dir: String) = spark.read.parquet(dir)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(labels(idx2) == labels(scratch),
      "refreshed index must be label-identical to a full rebuild")
    // serve correctness: exhaustive probing of the refreshed index is a
    // full scan — it must equal brute force over the grown corpus exactly
    val viaIndex = Similarity.knnIvfIndexed(spark, corpus, nProbe = 16)
      .collect().map(_.toSeq).toSeq
    val brute = Similarity.knnBrute(spark, corpus).collect().map(_.toSeq).toSeq
    assert(viaIndex == brute,
      "exhaustive-probe serve over the refreshed index must equal brute force")
  }

  test("LSH refresh: old files untouched; exhaustive serve equals scan variant") {
    import spark.implicits._
    val (corpus, deltaVecs, _) = splitCorpus()
    val idx = Similarity.lshIndexDir(spark, corpus)
    val before = dataFiles(idx)
    deltaVecs.write.mode("append").parquet(s"$corpus/embeddings.parquet")
    val idx2 = Similarity.refreshLshIndex(spark, corpus, deltaVecs)
    val after = dataFiles(idx2)
    assert(before.forall { case (p, n) => after.get(p).contains(n) })
    assert(after.size > before.size)
    // the planes are static, so indexed results must equal the scan
    // variant over the grown corpus
    val viaIndex = Similarity.knnLshIndexed(spark, corpus).collect().map(_.toSeq).toSeq
    val scan = Similarity.knnLsh(spark, corpus).collect().map(_.toSeq).toSeq
    assert(viaIndex == scan)
  }

  test("BM25 refresh ≡ from-scratch scan over the grown corpus; stats exact") {
    val (corpus, _, deltaDocs) = splitCorpus()
    val root = Search.postingsIndexDir(spark, corpus)
    val before = dataFiles(s"$root/postings")
    deltaDocs.write.mode("append").parquet(s"$corpus/documents.parquet")
    val root2 = Search.refreshPostingsIndex(spark, corpus, deltaDocs)
    val after = dataFiles(s"$root2/postings")
    assert(before.forall { case (p, n) => after.get(p).contains(n) },
      "refresh must not modify or remove any pre-existing postings file")
    assert(after.size > before.size)
    // stats must equal the full recompute exactly (integer arithmetic)
    val st = spark.read.parquet(s"$root2/stats").head()
    val full = Tables.documents(spark, corpus)
      .agg(sum(size(split(col("text"), " "))).cast("long"), count(lit(1))).head()
    assert(st.getLong(0) == full.getLong(0) && st.getLong(1) == full.getLong(1))
    // scores through the refreshed index ≡ the from-scratch scan pipeline
    // over the grown corpus — a genuinely independent ground truth
    val viaIndex = Search.bm25TopKIndexed(spark, corpus).collect().map(_.toSeq).toSeq
    val scan = Search.bm25TopK(spark, corpus).collect().map(_.toSeq).toSeq
    assert(viaIndex == scan,
      "refreshed-index BM25 must equal the full-corpus scan recompute")
  }

  test("staleness readout: censuses partition both populations; planted drift flags") {
    import spark.implicits._
    val rep = Similarity.indexStaleness(spark, SfSmall).collect().toSeq
    val nCorpus = Tables.embeddings(spark, SfSmall).count()
    val nDelta = Tables.embeddings(spark, SfSmall)
      .filter($"vec_id" % 10 === 3).count()
    assert(rep.map(_.getLong(1)).sum == nCorpus,
      "n_build must census the whole corpus")
    assert(rep.map(_.getLong(2)).sum == nDelta,
      "n_delta must census the whole batch")
    // the planted concentrated drift (coordinate 0 forced dominant) must
    // flag at least one cell, and the flag must be exactly the >4x-uniform
    // integer rule on the report's own counts
    val k = rep.size
    rep.foreach { r =>
      val expect = if (r.getLong(2) * k > nDelta * 4) 1 else 0
      assert(r.getInt(5) == expect, s"stale flag must follow the rule: $r")
    }
    assert(rep.exists(_.getInt(5) == 1),
      "concentrated drift must trip the retrain trigger")
    // and the flagged cells' assignment quality degrades vs build time
    rep.filter(_.getInt(5) == 1).foreach { r =>
      assert(r.getDouble(4) < r.getDouble(3),
        s"drifted batch should quantize worse than the build population: $r")
    }
    // readout is a pure preview: the served index is NOT mutated
    val idx = Similarity.ivfIndexDir(spark, SfSmall)
    assert(spark.read.parquet(idx).count() == nCorpus,
      "staleness preview must not append to the index")
  }

  test("targeted delete rewrites only touched cells; emptied cells do not resurrect") {
    import spark.implicits._
    val (corpus, _, _) = splitCorpus()
    val idx = Similarity.ivfIndexDir(spark, corpus)
    val all = spark.read.parquet(idx)
      .select($"vec_id", $"cell").as[(Long, Int)].collect()
    // tombstones: a scattered slice PLUS the entirety of one cell (the
    // emptied-cell edge where dynamic overwrite alone would resurrect)
    val victimCell = all.groupBy(_._2).minBy(_._2.length)._1
    val tomb = (all.filter(_._1 % 7 == 0).map(_._1) ++
      all.filter(_._2 == victimCell).map(_._1)).distinct.toSeq
    val untouchedCells = all.map(_._2).toSet --
      all.filter(t => tomb.contains(t._1)).map(_._2).toSet
    val before = dataFiles(idx)
    Similarity.deleteFromIvfIndex(spark, corpus, tomb.toDF("vec_id"))
    // exact survivor set, nothing else
    val after = spark.read.parquet(idx)
      .select($"vec_id").as[Long].collect().toSet
    assert(after == all.map(_._1).toSet -- tomb,
      "index must hold exactly the survivors")
    // the fully-emptied cell is gone from disk, not just from the scan
    assert(!new java.io.File(s"$idx/cell=$victimCell").exists(),
      "an emptied cell directory must be removed")
    // untouched cells' files are byte-identical
    val afterFiles = dataFiles(idx)
    val untouchedPrefixes = untouchedCells.map(c => s"/cell=$c/")
    before.filter { case (p, _) => untouchedPrefixes.exists(p.contains) }
      .foreach { case (p, n) =>
        assert(afterFiles.get(p).contains(n),
          s"untouched cell file must stay byte-identical: $p")
      }
  }

  test("compaction merges fragmented cells only; content identical") {
    import spark.implicits._
    val (corpus, deltaVecs, _) = splitCorpus()
    val idx = Similarity.ivfIndexDir(spark, corpus)
    // fragment: several small appends, one file per touched cell each
    val deltas = deltaVecs.collect()
    deltas.grouped(15).zipWithIndex.foreach { case (g, i) =>
      Similarity.refreshIvfIndex(spark, corpus,
        spark.createDataFrame(java.util.Arrays.asList(g: _*), deltaVecs.schema))
    }
    def filesPerCell(): Map[String, Int] = dataFiles(idx).keys.toSeq
      .filter(_.split('/').last.startsWith("part-")) // not the .crc twins
      .flatMap(p => "cell=\\d+".r.findFirstIn(p))
      .groupBy(identity).view.mapValues(_.size).toMap
    val fragBefore = filesPerCell()
    assert(fragBefore.values.exists(_ > 4), "fixture must fragment some cell")
    val contentBefore = spark.read.parquet(idx)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val before = dataFiles(idx)
    Similarity.compactIvfIndex(spark, corpus, maxFilesPerCell = 4)
    val fragAfter = filesPerCell()
    // every fragmented cell collapsed to one file; no cell above the cap
    fragBefore.filter(_._2 > 4).keys.foreach { c =>
      assert(fragAfter(c) == 1, s"fragmented $c must compact to one file")
    }
    // cold cells were not rewritten
    val afterFiles = dataFiles(idx)
    val coldCells = fragBefore.filter(_._2 <= 4).keySet
    before.filter { case (p, _) => coldCells.exists(c => p.contains(s"/$c/")) }
      .foreach { case (p, n) =>
        assert(afterFiles.get(p).contains(n),
          s"cold cell file must stay byte-identical: $p")
      }
    // content is untouched
    val contentAfter = spark.read.parquet(idx)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(contentAfter == contentBefore, "compaction must not change content")
  }

  test("LSH delete + compaction: survivors only; cold sigs untouched") {
    import spark.implicits._
    val (corpus, deltaVecs, _) = splitCorpus()
    val idx = Similarity.lshIndexDir(spark, corpus)
    // fragment: three small appends, one file per touched sig each
    val deltas = deltaVecs.collect()
    deltas.grouped(34).foreach { g =>
      Similarity.refreshLshIndex(spark, corpus,
        spark.createDataFrame(java.util.Arrays.asList(g: _*), deltaVecs.schema))
    }
    val all = spark.read.parquet(idx)
      .select($"vec_id", $"sig").as[(Long, Int)].collect()
    // tombstones: a scattered slice plus ALL of the emptiest sig (the
    // resurrect edge, same as the IVF case — shared deleteKeys path)
    val victimSig = all.groupBy(_._2).minBy(_._2.length)._1
    val tomb = (all.filter(_._1 % 9 == 0).map(_._1) ++
      all.filter(_._2 == victimSig).map(_._1)).distinct.toSeq
    Similarity.deleteFromLshIndex(spark, corpus, tomb.toDF("vec_id"))
    val after = spark.read.parquet(idx)
      .select($"vec_id").as[Long].collect().toSet
    assert(after == all.map(_._1).toSet -- tomb,
      "LSH index must hold exactly the survivors")
    assert(!new java.io.File(s"$idx/sig=$victimSig").exists(),
      "an emptied sig directory must be removed")
    // compaction: fragmented sigs collapse, content identical
    val contentBefore = spark.read.parquet(idx)
      .select($"vec_id", $"sig").as[(Long, Int)].collect().toSet
    Similarity.compactLshIndex(spark, corpus, maxFilesPerSig = 1)
    val contentAfter = spark.read.parquet(idx)
      .select($"vec_id", $"sig").as[(Long, Int)].collect().toSet
    assert(contentAfter == contentBefore,
      "LSH compaction must not change content")
  }

  test("postings delete: stats exact; serve equals from-scratch over survivors") {
    import spark.implicits._
    val (corpus, _, _) = splitCorpus()
    val root = Search.postingsIndexDir(spark, corpus)
    val docs = Tables.documents(spark, corpus)
    val tomb = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id").as[Long].collect().toSeq
    Search.deleteFromPostingsIndex(spark, corpus, tomb.toDF("doc_id"))
    // stats must equal the exact recompute over the surviving docs
    val st = spark.read.parquet(s"$root/stats").head()
    val survivors = docs.filter($"doc_id" % 5 =!= 0)
    val full = survivors
      .agg(sum(size(split(col("text"), " "))).cast("long"), count(lit(1))).head()
    assert(st.getLong(0) == full.getLong(0) && st.getLong(1) == full.getLong(1),
      "stats must decrement in the same exact arithmetic the refresh adds in")
    // serve: the deleted index must score exactly like a from-scratch
    // scan over a corpus that never contained the deleted docs
    val corpusB = tmpDir("postings-delete-truth")
    survivors.write.parquet(s"$corpusB/documents.parquet")
    val viaIndex = Search.bm25TopKIndexed(spark, corpus).collect().map(_.toSeq).toSeq
    val scan = Search.bm25TopK(spark, corpusB).collect().map(_.toSeq).toSeq
    assert(viaIndex == scan,
      "post-delete BM25 must equal the from-scratch scan over survivors")
  }

  test("durable IVF index: refresh re-homes to the grown corpus's address") {
    import spark.implicits._
    val (corpus, deltaVecs, _) = splitCorpus()
    val root = tmpDir("refresh-artifact-root")
    val a = spark.newSession()
    a.conf.set("spark.graft.artifact.root", root)
    val idx1 = Similarity.ivfIndexDir(a, corpus)
    deltaVecs.write.mode("append").parquet(s"$corpus/embeddings.parquet")
    val idx2 = Similarity.refreshIvfIndex(a, corpus, deltaVecs)
    assert(idx2 != idx1, "append must move the content address")
    assert(!new java.io.File(idx1).exists(), "stale address must not linger")
    val b = spark.newSession()
    b.conf.set("spark.graft.artifact.root", root)
    assert(Similarity.ivfIndexDir(b, corpus) == idx2,
      "a later session must serve the refreshed index, not rebuild")
    assert(b.read.parquet(idx2).count() ==
      Tables.embeddings(b, corpus).count())
  }
}

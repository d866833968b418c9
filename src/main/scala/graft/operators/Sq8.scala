package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps.byteDot

/** Scalar quantization (SQ8): each embedding dimension is affinely mapped
  * to one unsigned byte against corpus-wide per-dimension [min, max]
  * bounds — 64 bytes per vector instead of 256, a 4× compression with
  * near-lossless recall (PQ in [[Pq]] is the 32× end of the same dial;
  * FAISS ships both as `SQ8` / `PQ`).
  *
  * Scoring uses the ADC identity for an affine code: with
  * decoded_j = min_j + code_j·step_j,
  *
  *   dot(q, decoded) = Σ q_j·min_j + Σ (q_j·step_j)·code_j
  *                   = K + byteDot(codes, w)
  *
  * so the per-candidate work is ONE fused byte·double loop over the
  * stored codes ([[graft.functions.ByteDotExpr]], inside whole-stage
  * codegen) against driver-precomputed w_j = q_j·step_j — no decode, no
  * float vector materialization, no UDF boxing (the deliberate contrast
  * to the PQ scorer's UDF). Cosine divides by the stored norm of the
  * dequantized vector (one float per vector, computed at encode time).
  *
  * Bounds come from one 64-row min/max aggregation (bounded driver data);
  * encoding is one narrow pass. Everything is deterministic; approximate
  * only through the 8-bit rounding → rows-only check, Sq8Spec pins
  * near-exact agreement with the float brute-force scan.
  */
object Sq8 {

  final case class Params(mins: Array[Double], steps: Array[Double])

  /** Per-dimension [min, max] → (min, step) with step = (max−min)/255;
    * a constant dimension gets step 0 (every code 0, decodes to min).
    * Memoized per (session, corpus) via [[SessionCaches]] — bounded value
    * (2×64 doubles). */
  private[operators] def paramsOf(emb: DataFrame, corpusKey: String): Params =
    SessionCaches.modelMemo(emb.sparkSession, s"sq8-params:$corpusKey") {
      val rows = emb
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy(col("pos"))
        .collect()
      val mins = rows.map(_.getFloat(1).toDouble)
      val steps = rows.map(r => (r.getFloat(2).toDouble - r.getFloat(1)) / 255.0)
      Params(mins, steps)
    }

  /** (…, sq8_code binary, sq8_norm double): the stored index form. The
    * norm is of the DEQUANTIZED vector so ADC cosine is internally
    * consistent. Encode is a one-time narrow index build (UDF is fine
    * here — it runs once per corpus, not per query). */
  private[operators] def encodedOf(emb: DataFrame, corpusKey: String): DataFrame = {
    val p = paramsOf(emb, corpusKey)
    val bc = emb.sparkSession.sparkContext.broadcast(p)
    val enc = udf { (v: Seq[Float]) =>
      val pp = bc.value
      val codes = new Array[Byte](v.length)
      var normSq = 0.0
      var i = 0
      while (i < v.length) {
        val c =
          if (pp.steps(i) == 0.0) 0
          else math.max(0, math.min(255,
            math.round((v(i) - pp.mins(i)) / pp.steps(i)).toInt))
        codes(i) = c.toByte
        val dec = pp.mins(i) + c * pp.steps(i)
        normSq += dec * dec
        i += 1
      }
      (codes, math.sqrt(normSq))
    }
    emb.withColumn("e", enc(col("embedding")))
      .withColumn("sq8_code", col("e._1"))
      .withColumn("sq8_norm", col("e._2"))
      .drop("e")
  }

  /** ADC cosine top-k over the byte codes for query vector `qv`. */
  private[operators] def knnSq8Of(emb: DataFrame, corpusKey: String,
      qv: Array[Double], k: Int = 10): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val p = paramsOf(emb, corpusKey)
    val bias = qv.indices.map(j => qv(j) * p.mins(j)).sum
    val w = qv.indices.map(j => qv(j) * p.steps(j))
    val qNorm = math.sqrt(qv.map(x => x * x).sum)
    encodedOf(emb, corpusKey)
      .filter($"vec_id" =!= 0L)
      .select($"vec_id", $"label",
        round(((lit(bias) + byteDot($"sq8_code", typedlit(w))) /
          ($"sq8_norm" * lit(qNorm))), 6).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(k)
  }

  /** Registered form: query vector is vec_id=0, like the other kNN
    * variants. */
  def knnSq8(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    knnSq8Of(emb, d, qv)
  }

  val defs: Seq[Q] = Seq(
    // SQ8 cosines are approximate (8-bit scalar quantization) — ids/order
    // golden-pinned, scores guarded within 0.01 of the true cosine
    // recomputed from embeddings (observed SQ8 error ≤0.0018 across sfs)
    Q("sim_knn_sq8", Some(Golden.knnApproxGuarded("sim_knn_sq8", "cos", 0.01)), knnSq8))
}

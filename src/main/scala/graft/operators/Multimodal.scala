package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: treat binary payloads as opaque `binary`
  * columns with typed metadata, with decode/feature-extraction behind a
  * clearly-marked STUB (no image/audio libs in this container — builder
  * brief). The Spark-side plumbing (schema, batching, partitioning, feature
  * shapes) is real and tested; only the codec is fake.
  *
  * The synthetic "media" payload is the document text cast to binary, which
  * keeps the metadata (byte length, content hash) oracle-checkable.
  */
object Multimodal {

  private def binCol = col("text").cast("binary")

  /** Typed metadata over the binary column: byte length + content hash —
    * the real part of any multimodal ingest (dedup keys, size filters). */
  def binaryMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        length(binCol).cast("long").as("n_bytes"),
        sha2(binCol, 256).as("sha"))
      .orderBy($"doc_id")
  }

  val binaryMetaOracle: String =
    """SELECT doc_id,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       sha256(text) AS sha
      |FROM documents ORDER BY doc_id""".stripMargin

  /** STUB decoder, nested form: stands in for image/audio decode + feature
    * extraction. A real deployment swaps the inner expression for a codec
    * call (e.g. via mapPartitions batching a native decoder); everything
    * around it — binary column in, fixed-width float feature vector + frame
    * count out, narrow per-row map, no shuffle — is the production plumbing.
    * Features are a deterministic fake: xxhash64 over 8 byte-chunks,
    * normalized to [0,1). This nested-typed variant is the library API
    * (covered by MultimodalSpec); the registered/checked query is the
    * scalar flattening below — the driver's checker hashes scalar columns
    * only. */
  def decodeFeaturesNested(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("bin", binCol)
      .select($"doc_id",
        // typed media metadata: the struct a real decoder would fill — the
        // STUB derives deterministic fake dimensions from the payload
        struct(
          lit("fake/raw").as("format"),
          (pmod(xxhash64($"bin"), lit(1280)) + 64).cast("int").as("width"),
          (pmod(xxhash64($"bin", lit(1)), lit(720)) + 64).cast("int").as("height")).as("meta"),
        floor(length($"bin") / 64).cast("int").as("n_frames"),
        // frame sampling: every 4th 64-byte "frame" offset (STUB of video
        // frame selection; the plumbing — bounded array per row — is real)
        // guarded: sequence(0, -1) would yield a DESCENDING [0, -1] for
        // sub-frame payloads — short assets must sample zero frames
        expr("""CASE WHEN length(bin) >= 64 THEN
               |  filter(transform(sequence(0, cast(length(bin) / 64 as int) - 1),
               |                 f -> f * 64),
               |         o -> pmod(o / 64, 4) = 0)
               |ELSE array() END""".stripMargin).as("sampled_frame_offsets"),
        // resize: target dimensions a real decoder would scale to — pure
        // metadata transform here (no pixels in the container)
        least((pmod(xxhash64($"bin"), lit(1280)) + 64), lit(224)).cast("int").as("resized_w"),
        least((pmod(xxhash64($"bin", lit(1)), lit(720)) + 64), lit(224)).cast("int").as("resized_h"),
        expr(
          """transform(sequence(0, 7),
            |  i -> pmod(xxhash64(substring(bin, i * 8 + 1, 8)), 1000) / 1000.0)"""
            .stripMargin).as("features"))
      .orderBy($"doc_id")
  }

  /** Scalar-flattened view of [[decodeFeaturesNested]] for the driver's
    * correctness gate: the meta struct becomes width/height int columns and
    * each array column becomes an xxhash64 digest of its comma-joined
    * elements — fully deterministic, sortable, hashable. */
  def decodeFeaturesStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeaturesNested(s, d)
      .select($"doc_id",
        $"meta.format".as("format"),
        $"meta.width".as("width"),
        $"meta.height".as("height"),
        $"n_frames",
        size($"sampled_frame_offsets").as("n_sampled_frames"),
        xxhash64(concat_ws(",",
          expr("transform(sampled_frame_offsets, o -> cast(o as string))")))
          .as("frame_offsets_digest"),
        $"resized_w", $"resized_h",
        xxhash64(concat_ws(",",
          expr("transform(features, x -> cast(x as string))")))
          .as("features_digest"))
      .orderBy($"doc_id")
  }

  /** Batched decode plumbing via typed mapPartitions — the Scala analog of
    * `mapInPandas`: rows are drained in fixed-size batches (the shape a
    * native codec/model wants), decoded batch-at-a-time, re-emitted as
    * typed rows. The decode itself is the same clearly-marked STUB (no
    * media libs in this container): a deterministic hash of the payload.
    * Partition-parallel, constant memory per task (one batch in flight). */
  def decodeBatchedNested(s: SparkSession, d: String, batchSize: Int = 64): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", binCol.as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // STUB batch decode: a real implementation hands `batch` to a
          // native decoder in one call; here each payload deterministically
          // yields (n_frames, 4-dim feature vector) from its bytes.
          batch.map { case (docId, bytes) =>
            val frames = bytes.length / 64
            val feats = (0 until 4).map { i =>
              val slice = bytes.drop(i * 16).take(16)
              (java.util.Arrays.hashCode(slice) & 0xffff) / 65536.0
            }
            (docId, frames, feats)
          }
        }
      }
      .toDF("doc_id", "n_frames", "features")
      .orderBy($"doc_id")
  }

  /** Scalar-flattened view of [[decodeBatchedNested]] for the correctness
    * gate (the feature array becomes an xxhash64 digest). */
  def decodeBatchedStub(s: SparkSession, d: String, batchSize: Int = 64): DataFrame = {
    import s.implicits._
    decodeBatchedNested(s, d, batchSize)
      .select($"doc_id",
        $"n_frames",
        xxhash64(concat_ws(",",
          expr("transform(features, x -> cast(x as string))")))
          .as("features_digest"))
      .orderBy($"doc_id")
  }

  val defs: Seq[Q] = Seq(
    Q("mm_binary_meta", Some(binaryMetaOracle), binaryMeta),
    Q("mm_decode_stub", None, decodeFeaturesStub),
    Q("mm_decode_batched", None, (s, d) => decodeBatchedStub(s, d)))
}

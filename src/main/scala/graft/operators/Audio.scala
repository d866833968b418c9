package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Audio as a first-class multimodal column — the missing third leg beside
  * the PNG image path and the array<binary> clip path in [[Multimodal]].
  *
  * Audio travels as an opaque `binary` column holding REAL RIFF/WAVE
  * streams (PCM16 mono): the corpus fixture SYNTHESIZES a deterministic
  * waveform per document and encodes it through a real WAV writer
  * (RIFF → fmt → LIST(INFO) → data, with the spec's odd-size pad byte);
  * the feature path walks the RIFF chunks back out — skipping unknown
  * chunks the way any real WAV in the wild demands — and decodes the
  * little-endian PCM payload. No native audio libs exist in this
  * container and none are needed: PCM WAV is a pure byte-layout format,
  * so unlike the image path's ImageIO dependency this codec is 100%
  * in-library.
  *
  * The synthesized samples are a closed-form integer function of
  * (doc_id, n_chars) — an LCG with a planted per-document silence cadence
  * and hard-clipping at ±90% full scale — chosen so a SQL engine can
  * recompute every sample from the documents table alone:
  *
  *   n  = 800 + (n_chars mod 800)            samples (0.1–0.2 s @ 8 kHz)
  *   p  = 2 + (doc_id mod 3)                 silence cadence (frames)
  *   a  = doc_id mod 1000003
  *   v_i = (a·1103515245 + i·12345 + 6789) mod 65536
  *   s_i = 0                      if ⌊i/160⌋ mod p = 0   (gated frame)
  *       = −32768                 else if v_i − 32768 < −29491
  *       = 32767                  else if v_i − 32768 > 29491
  *       = v_i − 32768            otherwise
  *
  * All arithmetic stays far inside int64, so the DuckDB oracle replays it
  * bit-for-bit via generate_series — the features and segment queries
  * below are FULLY independently recomputed, golden-free (the same
  * standard the PCA/kNN oracles meet). Per-window RMS energy, silence
  * detection, clip counting and voice-activity segmentation are the real
  * preprocessing steps of any speech-corpus pipeline (cf. the VAD +
  * framing front of every ASR data pipeline).
  *
  * Scale posture: synthesis/decode/framing are narrow per-row maps —
  * zero shuffle anywhere in either query (segmentation runs inside the
  * row over the ≤10-frame clip, emitted via a typed flatMap), so both
  * plans are a single scan → map → sort, embarrassingly parallel at any
  * corpus size. Exact integer energy sums (≤ 1599·32768² < 2^53) make
  * every emitted number bit-deterministic under repartitioning.
  */
object Audio {

  val SampleRate = 8000
  val FrameLen = 160
  private val ClipHi = 29491L // |s| beyond 90% full scale hard-clips

  // --- deterministic waveform synthesis (the corpus fixture) ------------

  private[operators] def synthSamples(docId: Long, nChars: Long): Array[Short] = {
    val n = (800L + (nChars % 800L)).toInt
    val p = (2L + (docId % 3L)).toInt
    val a = docId % 1000003L
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      if ((i / FrameLen) % p == 0) out(i) = 0
      else {
        val v = (a * 1103515245L + i.toLong * 12345L + 6789L) % 65536L
        val s0 = v - 32768L
        out(i) =
          (if (s0 < -ClipHi) -32768L else if (s0 > ClipHi) 32767L else s0).toShort
      }
      i += 1
    }
    out
  }

  // --- real RIFF/WAVE codec ---------------------------------------------

  /** Encode PCM16 mono as a real RIFF/WAVE stream. Deliberately includes a
    * LIST(INFO) metadata chunk with an ODD-sized body between fmt and data
    * — a legal, common layout (every DAW writes one) that forces readers
    * to actually walk chunks and honor the RIFF pad byte rather than
    * assume the 44-byte textbook header. */
  private[operators] def encodeWav(samples: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
    val info = "ISFTgraft".getBytes("US-ASCII") // 9 bytes: odd on purpose
    val listBody = 4 + info.length + (info.length & 1) // "INFO" + padded payload
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + listBody) + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    def tag(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffLen); tag("WAVE")
    tag("fmt "); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    tag("LIST"); buf.putInt(4 + info.length); tag("INFO")
    buf.put(info); buf.put(0.toByte) // RIFF pad byte for the odd body
    tag("data"); buf.putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse a RIFF/WAVE stream by walking its chunks: returns
    * (sampleRate, channels, bitsPerSample, samples). Skips unknown chunks
    * (honoring the odd-size pad byte), fails loudly on a non-RIFF stream,
    * a missing fmt/data chunk, or a non-PCM16-mono format — silent
    * fallback on malformed media is how corrupt corpora propagate. */
  private[operators] def parseWav(bytes: Array[Byte]): (Int, Int, Int, Array[Short]) = {
    require(bytes.length >= 12, s"not a RIFF stream: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    require(tag4() == "RIFF", "not a RIFF stream")
    buf.getInt // declared riff length
    require(tag4() == "WAVE", "RIFF stream is not WAVE")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val t = tag4()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), s"chunk $t overruns stream")
      t match {
        case "fmt " =>
          val fmtEnd = buf.position() + len
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM: audio format $audioFormat")
          channels = buf.getShort.toInt
          rate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          require(channels == 1 && bits == 16, s"not PCM16 mono: $channels ch / $bits bit")
          buf.position(fmtEnd)
        case "data" =>
          require(rate > 0, "data chunk before fmt chunk")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => // unknown chunk (LIST, fact, …): skip body + pad byte
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(samples != null, "no data chunk in WAVE stream")
    (rate, channels, bits, samples)
  }

  /** The audio corpus: one real WAV blob per document as a binary column. */
  def audioDocsOf(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, nChars) => (id, encodeWav(synthSamples(id, nChars))) }
  }

  def audioDocs(s: SparkSession, d: String): Dataset[(Long, Array[Byte])] =
    audioDocsOf(Tables.documents(s, d))

  // --- feature extraction ------------------------------------------------

  /** Per-frame exact integer energies of a PCM16 clip (sum of squares per
    * FrameLen window; final frame may be short). */
  private[operators] def frameEnergies(samples: Array[Short]): Array[Long] = {
    val nFrames = (samples.length + FrameLen - 1) / FrameLen
    val e = new Array[Long](nFrames)
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      e(i / FrameLen) += s * s
      i += 1
    }
    e
  }

  /** Clip-level features via a REAL decode of the WAV blob: header-derived
    * sample rate, duration, exact clip/silence counts, exact integer
    * energy, fixed-point RMS (floor quantization — identical IEEE ops on
    * both engines). Batched like [[Multimodal.decodeImagesOf]]: rows drain
    * in fixed-size batches, constant memory per task. */
  def audioFeaturesOf(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    audioDocsOf(docs)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, wav) =>
            val (rate, _, _, samples) = parseWav(wav)
            val n = samples.length
            var sumSq = 0L
            var clipped = 0L
            var i = 0
            while (i < n) {
              val v = samples(i).toLong
              sumSq += v * v
              if (v >= 32767L || v <= -32767L) clipped += 1
              i += 1
            }
            val energies = frameEnergies(samples)
            val silent = energies.count(_ == 0L).toLong
            val rmsE4 = math.floor(10000d * math.sqrt(sumSq.toDouble / n)).toLong
            (id, rate, n.toLong, n.toLong * 1000L / rate, energies.length.toLong,
              clipped, silent, sumSq, rmsE4)
          }
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "duration_ms", "n_frames",
        "n_clipped", "n_silent_frames", "sum_sq", "rms_e4")
      .orderBy(col("doc_id"))
  }

  def audioFeatures(s: SparkSession, d: String): DataFrame =
    audioFeaturesOf(Tables.documents(s, d))

  /** Voice-activity segments: maximal runs of consecutive non-silent
    * frames, one row per segment with its exact integer energy — the
    * framing step an ASR pipeline runs before chunking speech for
    * transcription. The gaps-and-islands scan runs INSIDE the row over
    * the clip's own ≤10 frames (a typed flatMap — no window, no shuffle),
    * which is the only shape that survives a billion-clip corpus. */
  def audioSegmentsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    audioDocsOf(docs)
      .flatMap { case (id, wav) =>
        val (_, _, _, samples) = parseWav(wav)
        val energies = frameEnergies(samples)
        val segs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var f = 0
        while (f < energies.length) {
          if (energies(f) > 0L) {
            val start = f
            var e = 0L
            while (f < energies.length && energies(f) > 0L) { e += energies(f); f += 1 }
            segs += ((id, start.toLong, (f - start).toLong, e))
          } else f += 1
        }
        segs
      }
      .toDF("doc_id", "seg_start", "seg_frames", "seg_energy")
      .orderBy(col("doc_id"), col("seg_start"))
  }

  def audioSegments(s: SparkSession, d: String): DataFrame =
    audioSegmentsOf(Tables.documents(s, d))

  /** Decimate-by-2 resampling (8 kHz → 4 kHz): keep every even-index
    * sample, re-derive duration/energy/RMS at the target rate — the
    * sample-rate normalization step every speech corpus runs before
    * featurization (a real resampler adds an anti-alias filter; plain
    * decimation keeps the arithmetic integer-exact and the oracle
    * replayable sample-by-sample). Narrow map like everything here. */
  def audioResampleOf(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    audioDocsOf(docs)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, wav) =>
            val (rate, _, _, samples) = parseWav(wav)
            val n = samples.length
            val nDs = (n + 1) / 2
            var sumSq = 0L
            var i = 0
            while (i < n) {
              if (i % 2 == 0) { val v = samples(i).toLong; sumSq += v * v }
              i += 1
            }
            val rateDs = rate / 2
            (id, nDs.toLong, rateDs, nDs.toLong * 1000L / rateDs, sumSq,
              math.floor(10000d * math.sqrt(sumSq.toDouble / nDs)).toLong)
          }
        }
      }
      .toDF("doc_id", "n_samples_ds", "sample_rate_ds", "duration_ms_ds",
        "sum_sq_ds", "rms_ds_e4")
      .orderBy(col("doc_id"))
  }

  def audioResample(s: SparkSession, d: String): DataFrame =
    audioResampleOf(Tables.documents(s, d))

  // --- fully independent oracles ----------------------------------------

  /** Shared sample recomputation: DuckDB replays the synthesis formula
    * from the documents table alone (generate_series 0..1598 joined on
    * i < n — DuckDB's generate_series rejects lateral column bounds), so
    * no golden and no engine output is involved anywhere downstream. */
  private val sampleCte: String =
    """params AS (
      |  SELECT doc_id, 800 + (n_chars % 800) AS n, 2 + (doc_id % 3) AS p,
      |         doc_id % 1000003 AS a
      |  FROM documents),
      |samples AS (
      |  SELECT doc_id, n, i, i // 160 AS f,
      |         CASE WHEN (i // 160) % p = 0 THEN 0
      |              WHEN v - 32768 < -29491 THEN -32768
      |              WHEN v - 32768 > 29491 THEN 32767
      |              ELSE v - 32768 END AS s
      |  FROM (SELECT doc_id, n, p, t.i AS i,
      |               (a * 1103515245 + t.i * 12345 + 6789) % 65536 AS v
      |        FROM params JOIN generate_series(0, 1598) AS t(i) ON t.i < params.n) z),
      |frames AS (
      |  SELECT doc_id, f, sum(s * s) AS fe,
      |         sum(CASE WHEN abs(s) >= 32767 THEN 1 ELSE 0 END) AS fclip
      |  FROM samples GROUP BY doc_id, f)""".stripMargin

  private val featuresOracle: String =
    s"""WITH $sampleCte
       |SELECT doc_id,
       |       CAST(8000 AS INT) AS sample_rate,
       |       CAST(max(n) AS BIGINT) AS n_samples,
       |       CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
       |       CAST(count(*) AS BIGINT) AS n_frames,
       |       CAST(sum(fclip) AS BIGINT) AS n_clipped,
       |       CAST(sum(CASE WHEN fe = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent_frames,
       |       CAST(sum(fe) AS BIGINT) AS sum_sq,
       |       CAST(floor(10000 * sqrt(CAST(sum(fe) AS DOUBLE) / max(n))) AS BIGINT) AS rms_e4
       |FROM (SELECT fr.doc_id, fr.f, fr.fe, fr.fclip, p.n
       |      FROM frames fr JOIN params p USING (doc_id)) j
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val segmentsOracle: String =
    s"""WITH $sampleCte,
       |voiced AS (
       |  SELECT doc_id, f, fe,
       |         f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
       |  FROM frames WHERE fe > 0)
       |SELECT doc_id,
       |       CAST(min(f) AS BIGINT) AS seg_start,
       |       CAST(count(*) AS BIGINT) AS seg_frames,
       |       CAST(sum(fe) AS BIGINT) AS seg_energy
       |FROM voiced GROUP BY doc_id, grp ORDER BY doc_id, seg_start""".stripMargin

  private val resampleOracle: String =
    s"""WITH $sampleCte
       |SELECT doc_id,
       |       CAST((max(n) + 1) // 2 AS BIGINT) AS n_samples_ds,
       |       CAST(4000 AS INT) AS sample_rate_ds,
       |       CAST(((max(n) + 1) // 2) * 1000 // 4000 AS BIGINT) AS duration_ms_ds,
       |       CAST(sum(CASE WHEN i % 2 = 0 THEN s * s ELSE 0 END) AS BIGINT) AS sum_sq_ds,
       |       CAST(floor(10000 * sqrt(
       |         CAST(sum(CASE WHEN i % 2 = 0 THEN s * s ELSE 0 END) AS DOUBLE)
       |           / ((max(n) + 1) // 2))) AS BIGINT) AS rms_ds_e4
       |FROM samples
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("mm_audio_features", Some(featuresOracle), audioFeatures),
    Q("mm_audio_segments", Some(segmentsOracle), audioSegments),
    Q("mm_audio_resample", Some(resampleOracle), audioResample))
}

package graft.operators

import graft.{SparkSuite, Tables}

/** The WAV/PCM audio path: RIFF codec round-trip, genuine chunk-walking
  * (the encoder plants a LIST(INFO) chunk with an odd body so a
  * 44-byte-header shortcut would mis-parse), loud failure on malformed
  * media, a hand-replayed synthesis fixture, framing/energy/segment
  * arithmetic against an independent in-test recomputation, and
  * batch-size / repartitioning invariance.
  */
class AudioSpec extends SparkSuite {

  test("encodeWav round-trips header fields and samples exactly") {
    val samples = Audio.synthSamples(docId = 11L, nChars = 123L)
    val wav = Audio.encodeWav(samples)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, channels, bits, back) = Audio.parseWav(wav)
    assert((rate, channels, bits) == (8000, 1, 16))
    assert(back.sameElements(samples), "PCM payload corrupted by the codec round-trip")
  }

  test("parser walks chunks: the planted odd-size LIST(INFO) chunk is skipped correctly") {
    val wav = Audio.encodeWav(Array[Short](100, -100, 32767, -32768))
    // the LIST chunk sits between fmt and data; prove it is really there
    val asAscii = wav.map(b => if (b >= 32 && b < 127) b.toChar else '.').mkString
    assert(asAscii.contains("LIST"), "fixture must contain a LIST chunk")
    assert(asAscii.contains("INFO"), "fixture must contain an INFO body")
    val (_, _, _, back) = Audio.parseWav(wav)
    assert(back.toSeq == Seq[Short](100, -100, 32767, -32768))
  }

  test("parser fails loudly on malformed media") {
    val garbage = Array.fill[Byte](64)(42)
    val e1 = intercept[IllegalArgumentException](Audio.parseWav(garbage))
    assert(e1.getMessage.contains("RIFF"))
    intercept[IllegalArgumentException](Audio.parseWav(Array[Byte](1, 2, 3)))
    // a WAVE stream with no data chunk
    val truncated = Audio.encodeWav(Array[Short](1, 2, 3)).dropRight(14)
    intercept[IllegalArgumentException](Audio.parseWav(truncated))
  }

  test("synthesis replays the documented closed form by hand") {
    // doc_id=7, n_chars=47: n = 800 + 47 = 847, p = 2 + 7%3 = 3, a = 7
    val s = Audio.synthSamples(7L, 47L)
    assert(s.length == 847)
    // frame 0 (i < 160) is gated silent: f % p = 0
    assert(s.take(160).forall(_ == 0))
    // frames 1,2 voiced; frame 3 (i in 480..639) silent again
    assert(s.slice(480, 640).forall(_ == 0))
    // hand-replay i = 160: v = (7*1103515245 + 160*12345 + 6789) % 65536
    val v160 = (7L * 1103515245L + 160L * 12345L + 6789L) % 65536L
    val raw = v160 - 32768L
    val want =
      if (raw < -29491L) -32768L else if (raw > 29491L) 32767L else raw
    assert(s(160).toLong == want)
    // clipping really occurs on this waveform (±90% full scale is exceeded)
    assert(s.exists(x => x == 32767 || x == -32768), "no clipped samples in fixture")
  }

  test("features match an independent in-test recomputation on sf0.001") {
    val rows = Audio.audioFeatures(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val samples = Audio.synthSamples(id, docs(id))
      val n = samples.length
      val sumSq = samples.map(s => s.toLong * s.toLong).sum
      val energies = samples.grouped(Audio.FrameLen)
        .map(_.map(s => s.toLong * s.toLong).sum).toArray
      assert(r.getInt(1) == 8000)
      assert(r.getLong(2) == n.toLong, s"n_samples for doc $id")
      assert(r.getLong(3) == n.toLong * 1000L / 8000L)
      assert(r.getLong(4) == energies.length.toLong)
      assert(r.getLong(5) == samples.count(s => s == 32767 || s == -32768 || s == -32767).toLong)
      assert(r.getLong(6) == energies.count(_ == 0L).toLong, s"silent frames for doc $id")
      assert(r.getLong(7) == sumSq)
      assert(r.getLong(8) == math.floor(10000d * math.sqrt(sumSq.toDouble / n)).toLong)
    }
  }

  test("segments are the maximal voiced runs, with exact energies") {
    val segs = Audio.audioSegments(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference islands computed independently per doc
    val want = docs.toSeq.sortBy(_._1).flatMap { case (id, nChars) =>
      val energies = Audio.synthSamples(id, nChars).grouped(Audio.FrameLen)
        .map(_.map(s => s.toLong * s.toLong).sum).toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var f = 0
      while (f < energies.length) {
        if (energies(f) > 0) {
          val st = f; var e = 0L
          while (f < energies.length && energies(f) > 0) { e += energies(f); f += 1 }
          out += ((id, st.toLong, (f - st).toLong, e))
        } else f += 1
      }
      out
    }
    assert(segs.toSeq == want)
    // sanity: every doc has at least one voiced segment (p >= 2 means at
    // most every other frame is gated, and clips have >= 5 frames)
    assert(want.map(_._1).distinct.size == docs.size)
  }

  test("resample keeps exactly the even-index samples") {
    val rows = Audio.audioResample(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val samples = Audio.synthSamples(id, docs(id))
      val kept = samples.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v.toLong }
      assert(r.getLong(1) == kept.length.toLong)
      assert(r.getInt(2) == 4000)
      assert(r.getLong(3) == kept.length.toLong * 1000L / 4000L)
      assert(r.getLong(4) == kept.map(v => v * v).sum)
      assert(r.getLong(5) == math.floor(
        10000d * math.sqrt(kept.map(v => v * v).sum.toDouble / kept.length)).toLong)
    }
  }

  test("features are batch-size invariant and bit-deterministic under repartitioning") {
    val base = Audio.audioFeatures(spark, Sf).collect().toSeq
    val small = Audio.audioFeaturesOf(Tables.documents(spark, Sf), batchSize = 3)
      .collect().toSeq
    assert(base == small, "batch size must not affect results")
    val repart = Audio.audioFeaturesOf(Tables.documents(spark, Sf).repartition(7))
      .collect().toSeq
    assert(base == repart, "partitioning must not affect results")
  }

  test("plans are shuffle-free scans: no Exchange in either query") {
    for (q <- Seq(Audio.audioFeatures(spark, Sf), Audio.audioSegments(spark, Sf))) {
      // the trailing orderBy is the driver-contract sort; everything below
      // it must be a narrow scan→map chain
      val plan = q.queryExecution.executedPlan.toString
      val body = plan.linesIterator.filterNot(_.contains("Sort")).mkString("\n")
      assert(!body.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in audio plan:\n$plan")
    }
  }
}

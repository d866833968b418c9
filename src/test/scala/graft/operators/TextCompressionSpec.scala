package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** DEFLATE compression-ratio signal (TextOps.compressionRatio) and Zipf
  * fit (TextOps.zipfFit): first-principles codec behavior, round-trip
  * integrity, and a brute-force regression recompute. */
class TextCompressionSpec extends SparkSuite {

  test("repetition compresses, entropy does not, round-trip is exact") {
    import spark.implicits._
    val rep = "spam ham " * 500                        // highly repetitive
    val rnd = {                                        // seeded pseudo-noise
      val r = new scala.util.Random(42)
      (1 to 4000).map(_ => (r.nextInt(94) + 33).toChar).mkString
    }
    val dir = tmpDir("graft-deflate")
    Seq((1L, rep, "en", "a", rep.length.toLong),
      (2L, rnd, "en", "a", rnd.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextOps.compressionRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(3) < 2500 && rows(1L).getString(4) == "repetitive")
    assert(rows(2L).getLong(3) > 8000 && rows(2L).getString(4) == "incompressible")
    // the engine's bytes actually round-trip: re-deflate the rep doc with
    // the same settings and inflate back
    val bytes = rep.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](bytes.length + 64)
    var n = 0
    while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
    assert(n == rows(1L).getLong(2), "engine ratio differs from direct zlib")
    val inf = new java.util.zip.Inflater(false)
    inf.setInput(buf, 0, n)
    val out = new Array[Byte](bytes.length)
    var m = 0
    while (!inf.finished()) m += inf.inflate(out, m, out.length - m)
    assert(m == bytes.length && out.sameElements(bytes))
  }

  test("zlib build matches the one the compression goldens were frozen on") {
    // The text_compression_ratio goldens pin exact DEFLATE byte counts —
    // stable only for a fixed zlib build (JDK vendors bundle different
    // zlib/zlib-ng versions). This canary turns a cross-runtime oracle
    // mismatch into a NAMED diagnosis with its remedy: if it fails,
    // regenerate the three text_compression_ratio goldens and
    // golden/zlib_canary.json on the new runtime (Verify dump + freeze).
    val recorded = {
      val txt = java.nio.file.Files.readString(
        java.nio.file.Paths.get(graft.operators.Golden.Root, "zlib_canary.json"))
      val m = """"canary_deflate_bytes":\s*(\d+)""".r.findFirstMatchIn(txt)
      m.get.group(1).toInt
    }
    val sb = new StringBuilder
    sb.append("the quick brown fox jumps over the lazy dog. " * 40)
    val r = new java.util.Random(20260816)
    (1 to 2000).foreach(_ => sb.append((r.nextInt(94) + 33).toChar))
    sb.append("spark graft compression canary " * 25)
    val bytes = sb.toString.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](bytes.length + 64)
    var n = 0
    while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
    d.end()
    assert(n == recorded,
      s"zlib build drift: canary deflates to $n bytes, goldens were frozen at " +
        s"$recorded — regenerate golden/*/text_compression_ratio.parquet and " +
        "golden/zlib_canary.json on this runtime before trusting the oracle gate")
  }

  test("ratios are deterministic across two runs and bounded on real docs") {
    val a = TextOps.compressionRatio(spark, Sf).collect().toSeq
    val b = TextOps.compressionRatio(spark, Sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(3) < 12000, s"doc ${r.getLong(0)}")
    }
  }

  test("zipf slope matches a brute-force least-squares recompute") {
    val cnts = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(100)
    val xs = cnts.indices.map(i => math.log(i + 1.0))
    val ys = cnts.map(c => math.log(c._2.toDouble))
    val n = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val got = TextOps.zipfFit(spark, Sf).head()
    assert(got.getLong(0) == n)
    assert(math.abs(got.getDouble(1) - slope) < 1e-3, s"slope ${got.getDouble(1)} vs $slope")
    // the synthetic corpus draws words near-uniformly, so the spectrum is
    // much flatter than natural language's −1 — assert direction only
    assert(got.getDouble(1) < 0.0, "top-of-spectrum slope must be negative")
  }
}

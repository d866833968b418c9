package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.{SparkSuite, Tables}

/** The real PNG codec path (round-3 verdict #4): golden-image decode
  * against hand-computed features, the encode→decode round trip, and the
  * corpus-level property that perceptual (aHash) dup groups reproduce
  * exact text dedup on this fixture.
  */
class MultimodalCodecSpec extends SparkSuite {

  test("golden image: decode of a hand-built 2x2 PNG matches hand-computed features") {
    // checkerboard: white at (0,0),(1,1); black at (1,0),(0,1)
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff); img.setRGB(1, 1, 0xffffff)
    img.setRGB(1, 0, 0x000000); img.setRGB(0, 1, 0x000000)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    // a REAL png stream: magic + IHDR
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')

    val (w, h, mr, mg, mb, ahash) = Multimodal.decodePng(bytes)
    assert((w, h) == (2, 2))
    assert((mr, mg, mb) == (127.5, 127.5, 127.5))
    // aHash after NEAREST 8x8 upscale: source pixel (x/4, y/4) — white
    // quadrants are top-left and bottom-right; mean gray = 127.5, so bits
    // set exactly on the white quadrants
    var expected = 0L
    for (i <- 0 until 64) {
      val (x, y) = (i % 8, i / 8)
      if ((x / 4) == (y / 4)) expected |= (1L << i)
    }
    assert(ahash == expected, f"ahash ${ahash}%016x != ${expected}%016x")
  }

  test("encodePng round-trips pixel-exactly through the JDK reader") {
    val rnd = new scala.util.Random(7)
    val img = new BufferedImage(23, 17, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 23)
      img.setRGB(x, y, rnd.nextInt() & 0xffffff)
    val bytes = Multimodal.encodePng(img)
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(back.getWidth == 23 && back.getHeight == 17)
    for (y <- 0 until 17; x <- 0 until 23)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff),
        s"pixel ($x,$y) corrupted by encode round-trip")
  }

  test("render is deterministic and text-keyed; payloads are real PNGs") {
    val a = Multimodal.renderPng("the quick brown fox")
    val b = Multimodal.renderPng("the quick brown fox")
    val c = Multimodal.renderPng("a different document")
    assert(java.util.Arrays.equals(a, b), "same text must render identical bytes")
    assert(!java.util.Arrays.equals(a, c), "different text must render different images")
    assert((a(0) & 0xff) == 0x89 && a(1) == 'P') // PNG magic
    // round trip through the real reader
    val (w, h, _, _, _, _) = Multimodal.decodePng(a)
    assert(w >= 16 && w <= 32 && h >= 16 && h <= 28)
  }

  test("frame sampling decodes only the sampled frames of real clips") {
    val df = Multimodal.frameSample(spark, Sf).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val (n, sampled) = (r.getInt(1), r.getInt(2))
      assert(n >= 2 && n <= 6)
      assert(sampled == (n + 1) / 2, s"stride-2 of $n frames must keep ${(n + 1) / 2}")
      val gray = r.getDouble(3)
      assert(gray > 0 && gray < 255)
    }
  }

  test("aHash dup groups reproduce exact text dedup on the planted fixture") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // ground truth over the SAME planted relation the query uses: every
    // 50th doc duplicated at +1e9, so texts appearing >1 time are exactly
    // the planted pairs (plus any natural dups, of which small sf has none)
    val base = Tables.documents(spark, Sf).select($"doc_id", $"text")
    val planted = base.unionByName(
      base.filter($"doc_id" % 50 === 0)
        .select(($"doc_id" + 1000000000L).as("doc_id"), $"text"))
    val truth = planted
      .groupBy($"text")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("rep"), max($"doc_id").as("mx"))
      .filter($"n" > 1)
      .select($"rep", $"mx", $"n")
      .as[(Long, Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val got = Multimodal.ahashDupGroups(spark, Sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == truth, s"got=${got.size} truth=${truth.size}")
  }

  test("caption alignment: a planted mismatched caption scores strictly lower") {
    val spark2 = spark
    import spark2.implicits._
    // 3 true (image, caption) pairs + ONE planted mismatch: doc 2 captioned
    // with doc 1's text — the CLIP-filter shape on a corpus whose images
    // are a pure function of text
    val pairs = Seq(
      (1L, "the quick brown fox", "the quick brown fox"),
      (2L, "jumps over the lazy dog", "the quick brown fox"), // mismatch
      (3L, "pack my box with jugs", "pack my box with jugs"),
      (4L, "how vexingly quick daft", "how vexingly quick daft"))
      .toDS()
    val gotRows = Multimodal.captionAlignOf(pairs)
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    Seq(1L, 3L, 4L).foreach { id =>
      assert(gotRows(id) === ((64, true)),
        s"true caption of doc $id must reproduce the image exactly")
    }
    val (mScore, mAligned) = gotRows(2L)
    assert(mScore < 64 && !mAligned,
      s"planted mismatch must score strictly lower, got $mScore")
    assert(mScore >= 0 && mScore <= 63)
    info(s"mismatched caption scored $mScore/64 vs 64/64 for true captions")
  }

  test("registered caption-align query: swap rule and truth agree on the corpus") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // independent truth from the documents table alone: aligned iff the
    // planted caption (successor text for doc_id%25==0) equals own text
    val docs = Tables.documents(spark, Sf).select($"doc_id", $"text")
    val next = docs.select(($"doc_id" - 1).as("doc_id"), $"text".as("nt"))
    val truth = docs.join(next, Seq("doc_id"), "left")
      .select($"doc_id",
        (!($"doc_id" % 25 === 0 && $"nt".isNotNull && $"nt" =!= $"text")).as("aligned"))
      .as[(Long, Boolean)].collect().toMap
    val got = Multimodal.captionAlign(spark, Sf)
      .as[(Long, Int, Boolean)].collect()
    assert(got.length === truth.size)
    got.foreach { case (id, score, aligned) =>
      assert(aligned === truth(id), s"doc $id alignment disagrees with truth")
      assert(if (aligned) score == 64 else score < 64)
    }
    val misaligned = got.count(!_._3)
    assert(misaligned > 0, "the corpus fixture must plant some misalignments")
    info(s"$misaligned/${got.length} planted misalignments, all detected")
  }
}

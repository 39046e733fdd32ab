package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.ext.Multimodal.{ImageCodec, MediaItem}
import graft.ingest.Sources

/** The REAL codec path of the multimodal family: `javax.imageio` decode
  * (PNG/JPEG → pixels → exact width/height/band counts), bilinear resize
  * with aspect preserved, the stub fallback for opaque payloads, and the
  * gated round-trip query. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic RGB test image. */
  private def pattern(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 37 + y * 101) & 0xFFFFFF)
    img
  }

  private def jpegBytes(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("decodeMeta decodes a REAL generated PNG: exact width/height/" +
      "channels and a pixel-content checksum") {
    val png = ImageCodec.encodePng(pattern(64, 32))
    assert(ImageCodec.looksLikeImage(png))
    val meta = Multimodal.decodeMeta(spark,
      Seq(MediaItem(7L, "image", png)).toDS().toDF()).collect()
    assert(meta.length == 1)
    val m = meta.head
    assert(m.width == 64 && m.height == 32 && m.channels == 3,
      s"real decode dims: $m")
    assert(m.n_bytes == png.length.toLong)
    // checksum is over pixel CONTENT: recompute from the source image
    var want = 0L
    val src = pattern(64, 32)
    for (y <- 0 until 32; x <- 0 until 64) want = want * 31 + src.getRGB(x, y)
    assert(m.checksum == want, "pixel-fold checksum mismatch")
  }

  test("decodeMeta decodes a REAL generated JPEG (dims + bands exact; " +
      "decode is deterministic)") {
    val jpg = jpegBytes(pattern(48, 20))
    assert(ImageCodec.looksLikeImage(jpg))
    val run = () => Multimodal.decodeMeta(spark,
      Seq(MediaItem(1L, "image", jpg)).toDS().toDF()).collect().head
    val a = run(); val b = run()
    assert(a.width == 48 && a.height == 20 && a.channels == 3, a.toString)
    assert(a == b, "JPEG decode must be deterministic within one JVM")
  }

  test("opaque payloads take the FakeDecoder fallback, marked channels=0") {
    val m = Multimodal.decodeMeta(spark,
      Seq(MediaItem(3L, "audio", "not an image".getBytes("UTF-8")))
        .toDS().toDF()).collect().head
    assert(m.channels == 0 && m.n_bytes == 12L &&
      m.width == 12 && m.height == 12, s"stub path: $m")
  }

  test("resizeImages: oversized images scale to maxDim with aspect " +
      "preserved; small images and opaque payloads pass through unchanged") {
    val big = MediaItem(1L, "image", ImageCodec.encodePng(pattern(64, 32)))
    val small = MediaItem(2L, "image", ImageCodec.encodePng(pattern(8, 4)))
    val opaque = MediaItem(3L, "audio", "raw audio bytes".getBytes("UTF-8"))
    val out = Multimodal.resizeImages(spark,
        Seq(big, small, opaque).toDS().toDF(), maxDim = 16)
      .collect().map(m => m.doc_id -> m).toMap
    val resized = ImageCodec.readImage(out(1L).media).get
    assert(resized.getWidth == 16 && resized.getHeight == 8,
      s"64x32 @ maxDim 16 -> 16x8, got ${resized.getWidth}x${resized.getHeight}")
    assert(out(2L).media.sameElements(small.media), "small image untouched")
    assert(out(3L).media.sameElements(opaque.media), "opaque untouched")
  }

  test("q_media_decode_real: synthesized PNGs decode back to the doc_id-" +
      "derived dimensions (the gated round trip) on live testdata") {
    val docs = Sources.table(spark, sf("sf0.001"), "documents").limit(50)
    val got = Multimodal.decodeRealRoundTrip(spark, docs)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, w, h, c) =>
      assert(w == 1 + id % 16 && h == 1 + id % 8 && c == 3L,
        s"round trip broke for doc $id: ${(w, h, c)}")
    }
  }

  test("averageHash matches the pure id-arithmetic replay — the decoded " +
      "raster is pixel-identical to what synthesizePng painted") {
    // 5e9 exceeds both 2^24 (exercises the masked pixel seed) and the
    // ~3.5e9 bound where the UNMASKED multiply overflowed DuckDB BIGINT
    val ids = Seq(0L, 1L, 7L, 123L, 5000000000L)
    val got = Multimodal.averageHash(spark, ids.toDF("doc_id"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val want = ids.sorted.map { id =>
      val w = 1 + java.lang.Math.floorMod(id, 16L).toInt
      val h = 1 + java.lang.Math.floorMod(id, 8L).toInt
      val seed = java.lang.Math.floorMod(id, 1L << 24)
      val lumas = new Array[Long](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (seed * 2654435761L + x * 31 + y) & 0xFFFFFF
        lumas(y * w + x) = 299L * ((v >> 16) & 255) +
          587L * ((v >> 8) & 255) + 114L * (v & 255)
      }
      val n = lumas.length.toLong
      val mean = lumas.sum / n
      val above = lumas.count(_ > mean).toLong
      val hash = lumas.zipWithIndex.collect {
        case (l, i) if l > mean && i < Multimodal.AHashBits => 1L << i
      }.sum
      (id, n, mean, above, hash)
    }
    assert(got == want, s"got $got want $want")
    // the 1×1 image (doc 0) is its own mean: nothing above, hash 0
    assert(got.head == ((0L, 1L, got.head._3, 0L, 0L)), got.head.toString)
  }

  test("mediaNearDups ≡ a driver-side quadratic popcount replay over the " +
      "decoded hashes — the banded candidate generation is LOSSLESS at " +
      "radius bands−1 (pigeonhole), and the planted pair is found") {
    // range covers several dims classes AND a planted pair whose base
    // passes the ≥60-px filter: base 231 (231 % 33 = 0, 232 ≡ 1 mod 33,
    // dims 8×8) flips exactly one hash bit under the pixel inversion
    val ids = (0L until 430L).toDF("doc_id")
    val hs = Multimodal.averageHashDims(spark,
        Multimodal.synthesizeNearDupPng(spark, ids))
      .collect().filter(_.n_px >= Multimodal.AHashBits)
    val want = (for {
      a <- hs; b <- hs
      if a.doc_id < b.doc_id && a.w == b.w && a.h == b.h
      d = java.lang.Long.bitCount(a.ahash ^ b.ahash)
      if d <= Multimodal.NearDupRadius
    } yield (a.doc_id, b.doc_id, d.toLong)).toSeq
      .sortBy(p => (p._1, p._2))
    val got = Multimodal.mediaNearDups(spark, ids)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want, s"banding must be lossless: got ${got.size} " +
      s"want ${want.size}")
    assert(got.nonEmpty)
    // at least one planted predecessor pair (doc, doc+1) with doc+1 ≡ 1
    // mod 33 is inside the radius
    assert(got.exists(p => p._2 == p._1 + 1 &&
      java.lang.Math.floorMod(p._2, Multimodal.NearDupPlantMod) == 1L),
      s"planted near-dup pair must surface: $got")
  }

  test("mediaDupClasses ≡ a driver-side replay: identical-hash classes " +
      "with keeper and radius-bounded neighborhood counts") {
    val ids = (0L until 430L).toDF("doc_id")
    val hs = Multimodal.averageHashDims(spark,
        Multimodal.synthesizeNearDupPng(spark, ids))
      .collect().filter(_.n_px >= Multimodal.AHashBits)
    val classes = hs.groupBy(r => (r.w, r.h, r.ahash)).map {
      case ((w, h, ah), members) =>
        (w.toLong, h.toLong, ah, members.length.toLong,
          members.map(_.doc_id).min)
    }.toSeq
    val want = classes.map { case (w, h, ah, size, keeper) =>
      val nbs = classes.filter(c => c._1 == w && c._2 == h &&
        c._3 != ah &&
        java.lang.Long.bitCount(c._3 ^ ah) <= Multimodal.NearDupRadius)
      (w, h, ah, size, keeper, nbs.size.toLong, nbs.map(_._4).sum)
    }.sortBy(c => (c._1, c._2, c._3))
    val got = Multimodal.mediaDupClasses(spark, ids)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want, s"got ${got.size} classes want ${want.size}")
    // the corpus has at least one multi-member class and one class with
    // a non-empty neighborhood (otherwise the test demonstrates nothing)
    assert(got.exists(_._4 > 1L), "expect a multi-member class")
    assert(got.exists(_._6 > 0L), "expect a near-dup neighborhood")
  }

  test("synthesizePng payloads are stable across invocations (the PNG " +
      "writer is deterministic)") {
    val docs = Sources.table(spark, sf("sf0.001"), "documents").limit(5)
    val a = Multimodal.synthesizePng(spark, docs).collect()
      .map(m => m.doc_id -> m.media.toSeq).toMap
    val b = Multimodal.synthesizePng(spark, docs).collect()
      .map(m => m.doc_id -> m.media.toSeq).toMap
    assert(a == b)
  }
}

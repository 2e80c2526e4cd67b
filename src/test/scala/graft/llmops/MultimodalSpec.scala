package graft.llmops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world, this is a binary payload stand-in", "img"),
    (2L, "", "aud"), (3L, null.asInstanceOf[String], null.asInstanceOf[String])
  ).toDF("doc_id", "text", "source")

  private lazy val blobs = Multimodal.asBlobs(docs, "doc_id", "text", "source")

  // --- fixtures: real images encoded with the JDK's own writers --------

  /** w×h image: left half black, right half white. */
  private def halfAndHalf(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, os), s"no JDK writer for $format")
    os.toByteArray
  }

  private def animatedGif(imgs: Seq[BufferedImage]): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(os)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    imgs.foreach(i => w.writeToSequence(new IIOImage(i, null, null), null))
    w.endWriteSequence(); w.dispose(); ios.close()
    os.toByteArray
  }

  test("asBlobs: binary payload with kind defaults") {
    val r = blobs.collect().map(x => x.getAs[Long]("blob_id") ->
      (x.getAs[String]("kind"), x.getAs[Array[Byte]]("payload"))).toMap
    assert(r(1L)._1 == "img")
    assert(r(3L)._1 == "unknown")
    assert(new String(r(1L)._2, "UTF-8").startsWith("hello world"))
    assert(r(2L)._2.length == 0)
  }

  test("blobMetadata: length, digest, magic — no decode") {
    val m = Multimodal.blobMetadata(blobs).collect()
      .map(x => x.getAs[Long]("blob_id") -> x).toMap
    assert(m(1L).getAs[Long]("n_bytes") == 46L)
    assert(m(1L).getAs[String]("sha256").length == 64)
    assert(m(1L).getAs[String]("magic") == "68656C6C") // "hell"
  }

  test("decodeOne: real PNG → true dimensions and luma histogram") {
    val png = encode(halfAndHalf(10, 6), "png")
    val d = Multimodal.decodeOne(Multimodal.Blob(7L, "img", png))
    assert(d.width == 10 && d.height == 6)
    assert(d.n_frames == 1)
    assert(d.n_bytes == png.length.toLong)
    // half black (luma 0 → bin 0), half white (luma 255 → bin 7)
    assert(math.abs(d.features(0) - 0.5f) < 1e-6)
    assert(math.abs(d.features(7) - 0.5f) < 1e-6)
    assert((1 to 6).forall(d.features(_) == 0f))
    assert(math.abs(d.features.sum - 1f) < 1e-5)
  }

  test("decodeOne: BMP decodes identically to PNG (same pixels)") {
    val img = halfAndHalf(8, 8)
    val dPng = Multimodal.decodeOne(
      Multimodal.Blob(1L, "img", encode(img, "png")))
    val dBmp = Multimodal.decodeOne(
      Multimodal.Blob(2L, "img", encode(img, "bmp")))
    assert(dBmp.width == 8 && dBmp.height == 8)
    assert(dPng.features.toSeq == dBmp.features.toSeq)
  }

  test("decodeOne: animated GIF reports the real frame count") {
    val gif = animatedGif(Seq(halfAndHalf(4, 4), halfAndHalf(4, 4),
      halfAndHalf(4, 4)))
    val d = Multimodal.decodeOne(Multimodal.Blob(9L, "img", gif))
    assert(d.n_frames == 3)
    assert(d.width == 4 && d.height == 4)
  }

  test("decodeOne: mid-gray fills the middle bin") {
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x808080)
    val d = Multimodal.decodeOne(Multimodal.Blob(5L, "img",
      encode(img, "png")))
    assert(d.features(4) == 1f) // luma 128 → bin 128*8/256 = 4
  }

  test("decodeOne: truncated image falls back, stays total") {
    val png = encode(halfAndHalf(10, 6), "png")
    val broken = png.take(20) // header survives, data gone
    val d = Multimodal.decodeOne(Multimodal.Blob(3L, "img", broken))
    assert(d.n_bytes == 20L) // fallback ran, nothing threw
    assert(d.features.length == 8)
  }

  test("decode: non-image payloads take the deterministic fallback") {
    val d1 = Multimodal.decode(spark, blobs).collect()
      .map(x => x.blob_id -> x).toMap
    val d2 = Multimodal.decode(spark, blobs).collect()
      .map(x => x.blob_id -> x).toMap
    assert(d1(1L).features.toSeq == d2(1L).features.toSeq)
    assert(d1(1L).width >= 16 && d1(1L).height >= 16)
    assert(d1(1L).n_bytes == 46L)
    assert(d1(2L).features.length == 8)
  }

  test("decode: mixed image + non-image rows through the full stage") {
    val png = encode(halfAndHalf(10, 6), "png")
    val mixed = Seq(
      Multimodal.Blob(1L, "img", png),
      Multimodal.Blob(2L, "txt", "not an image".getBytes("UTF-8")))
      .toDS().toDF()
    val out = Multimodal.decode(spark, mixed).collect()
      .map(x => x.blob_id -> x).toMap
    assert(out(1L).width == 10 && out(1L).height == 6) // real decode
    assert(out(2L).width >= 16) // fallback signature
    assert(math.abs(out(1L).features(0) - 0.5f) < 1e-6)
  }

  test("bytesToPngBlobs → decode: real codec round-trip recovers dims") {
    val out = Multimodal.decode(spark,
      Multimodal.bytesToPngBlobs(spark, blobs)).collect()
      .map(x => x.blob_id -> x).toMap
    assert(out(1L).width == 16 && out(1L).height == 3) // 46 bytes → 3 rows
    assert(out(1L).n_frames == 1)
    assert(out(2L).height == 1) // empty payload → 1×16 black image
    assert(out(2L).features(0) == 1f) // all-zero pixels land in bin 0
  }

  test("frameSample: array-typed frames per blob") {
    val f = Multimodal.frameSample(blobs).collect()
      .map(x => x.getAs[Long]("blob_id") -> x.getSeq[String](x.fieldIndex("frames")))
      .toMap
    assert(f(1L).nonEmpty)
    assert(f(2L).length == 1) // degenerate empty payload → single frame
  }

  // --- perceptual hash --------------------------------------------------

  test("aHash: PNG encode → real decode pools the exact stored bytes") {
    // the decoded-raster hash must equal the byte-domain twin for the
    // lossless grayscale PNGs bytesToPngBlobs builds — this is the pin
    // that catches a color-model detour (getRGB on TYPE_BYTE_GRAY
    // gamma-converts linear gray to sRGB and silently decouples the
    // hash from the payload; raw single-band samples do not)
    val payloads = Seq(
      (1L, "hello world, this is a binary payload stand-in"),
      (2L, "the quick brown fox jumps over the lazy dog " * 4),
      (3L, "aAbBcC 123 éüß unicode tail"))
    val b = payloads.map { case (id, s) =>
      Multimodal.Blob(id, "txt", s.getBytes("UTF-8"))
    }.toDS().toDF()
    val hashed = Multimodal.aHash64(spark,
      Multimodal.bytesToPngBlobs(spark, b)).collect()
      .map(r => r.getAs[Long]("blob_id") -> r.getAs[Long]("ahash")).toMap
    payloads.foreach { case (id, s) =>
      assert(hashed(id) ==
        Multimodal.aHashFromBytes(s.getBytes("UTF-8"), 16),
        s"blob $id: decoded-raster hash must equal byte-domain hash")
    }
  }

  test("aHash: identical payloads collide, structured difference separates") {
    val base = "x" * 120 + "y" * 120
    val shifted = "y" * 120 + "x" * 120 // same bytes, opposite layout
    val b = Seq(
      Multimodal.Blob(1L, "t", base.getBytes("UTF-8")),
      Multimodal.Blob(2L, "t", base.getBytes("UTF-8")),
      Multimodal.Blob(3L, "t", shifted.getBytes("UTF-8")))
      .toDS().toDF()
    val h = Multimodal.aHash64(spark,
      Multimodal.bytesToPngBlobs(spark, b)).collect()
      .map(r => r.getAs[Long]("blob_id") -> r.getAs[Long]("ahash")).toMap
    assert(h(1L) == h(2L), "identical payloads must collide")
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 8,
      "layout-opposite payloads must be far apart")
  }

  test("hammingPairs on image hashes equals the brute-force pair set") {
    val rnd = new scala.util.Random(11)
    val sigs = (0L until 40L).map { i =>
      // clustered signatures: base patterns + ≤2 flipped bits
      val base = Array(0x0F0F0F0F0F0F0F0FL, 0x00FF00FF00FF00FFL,
        0x3333333333333333L)(i.toInt % 3)
      val flips = (0 until rnd.nextInt(3))
        .map(_ => 1L << rnd.nextInt(64)).foldLeft(0L)(_ | _)
      (i, base ^ flips)
    }
    val df = sigs.toDF("blob_id", "ahash")
    val got = Dedup.hammingPairs(df, "blob_id", "ahash", maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming")))
      .toSet
    val exp = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == exp, "pigeonhole join must be complete at radius 3")
  }
}

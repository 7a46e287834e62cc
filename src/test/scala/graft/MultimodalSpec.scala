package graft

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.{MediaCodec, MediaRow}

/** Pins the REAL image codec (javax.imageio): true raster dimensions and
  * an exact luminance histogram on hand-built PNG/BMP bytes, the
  * closed-form BMP size the DuckDB oracle relies on, the corrupt-image
  * and non-image channels, and a real raster resize — plus the
  * distributed extractFeatures path over all of them.
  */
class MultimodalSpec extends SparkSpec {

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** 4x2 image with known channel values: two black pixels (lum 0,
    * bin 0), two white (lum 255, bin 7), two mid-gray 128 (bin 4), one
    * red 0xFF0000 (lum 85, bin 2), one (90,200,10) (lum 100, bin 3).
    */
  private def knownImage(imgType: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(4, 2, imgType)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF)
    img.setRGB(2, 0, 0x808080); img.setRGB(3, 0, 0xFF0000)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0xFFFFFF)
    img.setRGB(2, 1, 0x808080)
    img.setRGB(3, 1, (90 << 16) | (200 << 8) | 10)
    img
  }
  private val expectedHist =
    Array[Float](2f, 0f, 1f, 1f, 2f, 0f, 0f, 2f)

  test("PNG decode reports true dimensions and the exact luminance histogram") {
    val bytes = encode(knownImage(java.awt.image.BufferedImage.TYPE_INT_RGB), "png")
    val Some((w, h, hist)) = MediaCodec.decodeImage(bytes)
    assert((w, h) == (4, 2))
    assert(hist.toSeq == expectedHist.toSeq)
  }

  test("BMP decode reports true dimensions and the exact luminance histogram") {
    val bytes = encode(knownImage(java.awt.image.BufferedImage.TYPE_3BYTE_BGR), "bmp")
    val Some((w, h, hist)) = MediaCodec.decodeImage(bytes)
    assert((w, h) == (4, 2))
    assert(hist.toSeq == expectedHist.toSeq)
  }

  test("syntheticBmp byte size matches the closed form the DuckDB oracle uses") {
    for (id <- Seq(0L, 1L, 7L, 31L, 95L, 499L)) {
      val w = 8 + (id % 32).toInt
      val h = 8 + (id % 24).toInt
      val bytes = Multimodal.syntheticBmp(id)
      assert(bytes.length == 54 + h * ((3 * w + 3) / 4 * 4), s"id=$id")
      val f = MediaCodec.decode(MediaRow(id, "image/bmp", bytes))
      assert((f.width, f.height, f.n_bytes) == (w, h, bytes.length.toLong), s"id=$id")
    }
  }

  test("a declared image that doesn't decode lands in the corrupt channel (-1/-1)") {
    // unrecognized bytes: no reader claims them (ImageIO returns null)
    val f = MediaCodec.decode(MediaRow(9L, "image/png",
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
    assert((f.width, f.height) == (-1, -1))
    // byte descriptor kept so the row stays triageable
    assert(f.feature.sum == (1 + 2 + 3 + 4 + 5 + 6 + 7 + 8).toFloat)
  }

  test("recognized-but-corrupt image bytes quarantine instead of throwing") {
    // valid PNG signature + truncated body: ImageIO's PNG reader claims
    // the stream and THROWS mid-decode — the realistic corrupt-media
    // case at scale, and it must route to -1/-1, not kill the stage
    val whole = encode(knownImage(java.awt.image.BufferedImage.TYPE_INT_RGB), "png")
    val truncated = java.util.Arrays.copyOfRange(whole, 0, 24)
    val f = MediaCodec.decode(MediaRow(10L, "image/png", truncated))
    assert((f.width, f.height) == (-1, -1))
    assert(f.n_bytes == 24L)
    // resize has the same contract: corrupt rows pass through untouched
    val spark0 = spark
    import spark0.implicits._
    val out = Multimodal.resizeImages(
      spark.createDataset(Seq(MediaRow(10L, "image/png", truncated))), 4, 4)
      .collect()(0)
    assert(out.media.toSeq == truncated.toSeq && out.kind == "image/png")
  }

  test("non-image kinds are rasterless by contract (0/0) with byte features") {
    val payload = "hello".getBytes("UTF-8")
    val f = MediaCodec.decode(MediaRow(3L, "text/plain", payload))
    assert((f.width, f.height) == (0, 0))
    assert(f.n_bytes == payload.length.toLong)
    assert(f.feature.sum == payload.map(_ & 0xFF).sum.toFloat)
  }

  test("extractFeatures runs the real codec distributed over a mixed Dataset") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      MediaRow(1L, "image/bmp", Multimodal.syntheticBmp(1L)),
      MediaRow(2L, "text/plain", "abc".getBytes("UTF-8")),
      MediaRow(3L, "image/png", Array[Byte](0, 1, 2)))
    val out = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(out(1L) == ((9, 9)))   // 8 + 1%32, 8 + 1%24
    assert(out(2L) == ((0, 0)))
    assert(out(3L) == ((-1, -1)))
  }

  test("resizeImages really rescales the raster; non-image rows pass through") {
    val spark0 = spark
    import spark0.implicits._
    val textPayload = "unchanged".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "image/bmp", Multimodal.syntheticBmp(20L)), // 28x16 source
      MediaRow(2L, "text/plain", textPayload))
    val out = Multimodal.resizeImages(spark.createDataset(rows), 10, 6)
      .collect().map(m => m.doc_id -> m).toMap
    val Some((w, h, _)) = MediaCodec.decodeImage(out(1L).media)
    assert((w, h) == (10, 6))
    assert(out(2L).media.toSeq == textPayload.toSeq)
  }
}

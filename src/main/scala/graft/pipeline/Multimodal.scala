package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with typed metadata alongside. The
  * image codec is REAL: `javax.imageio` (PNG/BMP/GIF/JPEG readers ship
  * with the JDK — no external dependency) decodes the raster and reports
  * true width/height plus a luminance histogram. Non-image kinds
  * (audio/video containers aren't in the JDK) get codec-free byte-level
  * features and are explicitly marked rasterless (width = height = 0).
  *
  * Scale notes: blobs ride in their own column so parquet column pruning
  * skips them unless touched; decode/feature-extraction runs as
  * `mapPartitions` over the typed Dataset — one JVM-side batch per
  * partition, the same execution shape a Pandas-UDF `mapInPandas` has in
  * PySpark. Keep media partitions small (`maxPartitionBytes`) so a
  * partition of blobs fits in executor memory. A declared image whose
  * bytes fail to decode is tagged width = height = -1 rather than failing
  * the job — at 100 TB corrupt media routes to a quarantine filter, it
  * doesn't kill the stage.
  */
object Multimodal {

  /** A media row: opaque payload + metadata columns. */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  /** Extracted features: fixed-size descriptor + dimensions. */
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, feature: Array[Float])

  /** Real image codec over the JDK's `javax.imageio`. ALL ImageIO use
    * routes through this object so its initializer below is guaranteed
    * to have run first on every executor JVM.
    */
  object MediaCodec {

    // ImageIO's default stream cache spools every read/write through an
    // on-disk temp file — one create+delete PER ROW inside
    // mapPartitions, for buffers that already live in memory. Off, once
    // per JVM (this object initializes on first use on each executor).
    javax.imageio.ImageIO.setUseCache(false)

    /** BMP-encode a raster (the shared writer behind [[syntheticBmp]]
      * and [[resizeImages]]).
      */
    private[pipeline] def encodeBmp(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }

    /** Raster decode that returns null for BOTH unrecognized bytes and
      * recognized-but-corrupt bodies (ImageIO throws on the latter).
      */
    private[pipeline] def readOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }

    /** True raster decode: `Some((width, height, 8-bin luminance
      * histogram))`, or None when the bytes don't decode — BOTH when no
      * installed reader recognises them (ImageIO returns null) and when
      * a reader recognises the format but the body is corrupt/truncated
      * (ImageIO throws). The realistic corrupt-media case at scale is
      * the second one, and it must quarantine, not kill the stage. The
      * histogram counts pixels by `lum >> 5` where lum is the integer
      * mean of the R/G/B channels — deterministic, so specs pin exact
      * values.
      */
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      val img = readOrNull(bytes)
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // counts accumulate in LONGS: Float += 1 stops incrementing at
        // 2^24 (a mostly-uniform >=4096x4096 raster silently undercounts
        // a bin); one conversion at the end loses at most float rounding
        val hist = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
            hist(lum >> 5) += 1L
            x += 1
          }
          y += 1
        }
        Some((w, h, hist.map(_.toFloat)))
      }
    }

    /** Codec-free descriptor for non-image payloads: rolling byte sums.
      * No raster, so callers pair this with width = height = 0. Sums
      * accumulate in longs (a Float accumulator drifts once a lane's sum
      * passes 2^24 — multi-MB payloads get there) and convert once.
      */
    def byteFeatures(media: Array[Byte]): Array[Float] = {
      val feat = new Array[Long](8)
      var i = 0
      while (i < media.length) { feat(i % 8) += (media(i) & 0xFF).toLong; i += 1 }
      feat.map(_.toFloat)
    }

    /** Decode one media row. `image/...` kinds go through the real raster
      * decode; a declared image whose bytes don't decode is the corrupt-
      * media channel (width = height = -1, byte descriptor kept so the
      * row stays triageable); non-image kinds are rasterless by contract
      * (width = height = 0).
      */
    def decode(m: MediaRow): MediaFeatures =
      if (m.kind.startsWith("image/"))
        decodeImage(m.media) match {
          case Some((w, h, hist)) =>
            MediaFeatures(m.doc_id, m.kind, m.media.length.toLong, w, h, hist)
          case None =>
            MediaFeatures(m.doc_id, m.kind, m.media.length.toLong, -1, -1,
              byteFeatures(m.media))
        }
      else
        MediaFeatures(m.doc_id, m.kind, m.media.length.toLong, 0, 0,
          byteFeatures(m.media))
  }

  /** Deterministic synthetic BMP for the driver corpus (the driver tables
    * carry no real media, so the image path synthesizes one BMP per doc —
    * the codec exercised on it is the real one). Dimensions derive from
    * docId; pixels are a fixed function of (x, y, docId). The JDK BMP
    * writer emits a 54-byte header + BGR rows padded to 4 bytes, so
    * `n_bytes = 54 + h * ((3w + 3) / 4 * 4)` — a closed form the DuckDB
    * oracle recomputes from doc_id (verified exact for all w/h in range).
    */
  def syntheticBmp(docId: Long): Array[Byte] = {
    // the DuckDB oracle derives dimensions with sign-following %, which
    // diverges from floorMod for negative ids — reject at the synthesis
    // boundary rather than silently hash-mismatching on a corpus that
    // carries negative doc ids
    require(docId >= 0, s"syntheticBmp requires a non-negative docId, got $docId")
    val w = 8 + java.lang.Math.floorMod(docId, 32L).toInt
    val h = 8 + java.lang.Math.floorMod(docId, 24L).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 37 + y * 101 + java.lang.Math.floorMod(docId, 256L).toInt * 13) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    MediaCodec.encodeBmp(img)
  }

  /** Image ingest: one synthetic BMP per document. In production this is
    * `spark.read.format("binaryFile")` over an image corpus; the synthetic
    * payloads keep everything downstream — including the codec — real.
    */
  def ingestImages(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, "image/bmp", syntheticBmp(id)))
  }

  /** Ingest: attach a binary payload column. In production this reads
    * real media files (`spark.read.format("binaryFile")`); here document
    * text bytes stand in as the payload (kind `text/plain`, so the codec
    * correctly treats them as rasterless).
    */
  def ingestFromText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("text/plain").as("kind"),
      to_binary(col("text"), lit("utf-8")).as("media"))

  /** Distributed feature extraction: typed mapPartitions over binary
    * payloads (the Scala equivalent of `mapInPandas` batch processing),
    * dispatching to the real image codec per [[MediaCodec.decode]].
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(MediaCodec.decode))
  }

  /** Cheap metadata that never touches a codec: byte sizes per blob —
    * parquet reads only the lengths when the reader prunes columns.
    */
  def byteStats(media: DataFrame): DataFrame =
    media.select(col("doc_id"), octet_length(col("media")).cast("int").as("n_bytes"))
      .orderBy("doc_id")

  /** One sampled "frame" of a media payload. */
  final case class Frame(doc_id: Long, frame_ix: Int, n_bytes: Int,
                         payload: Array[Byte])

  /** Frame sampling (the video path's 1->N expansion): split each payload
    * into `frameBytes` chunks, keep every `everyN`-th. A video-container
    * demuxer isn't in the JDK, so byte chunking stands in for frame
    * boundaries, but the execution shape — a flatMap over typed rows
    * producing multiple blob rows, the per-partition batch model, the
    * downstream schema — is the real thing. Output rows stay narrow until
    * `payload` is touched (parquet column pruning).
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): Dataset[Frame] = {
    require(frameBytes > 0 && everyN > 0,
      s"frameBytes ($frameBytes) and everyN ($everyN) must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { m =>
      val n = m.media.length
      val nFrames = (n + frameBytes - 1) / frameBytes
      (0 until nFrames by everyN).iterator.map { ix =>
        val start = ix * frameBytes
        val len = math.min(frameBytes, n - start)
        Frame(m.doc_id, ix, len,
          java.util.Arrays.copyOfRange(m.media, start, start + len))
      }
    }
  }

  /** Real raster resize for image kinds: decode, bilinear-scale with JDK
    * Graphics2D to targetW x targetH, re-encode as BMP. Non-image (or
    * undecodable) payloads pass through unchanged — resizing bytes that
    * aren't a raster would be a lie, and at 100 TB the pass-through rows
    * are the quarantine channel's input.
    */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions ($targetW x $targetH) must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      // same quarantine contract as MediaCodec.decodeImage: a
      // recognized-but-corrupt body throws inside ImageIO and must pass
      // through untouched, not kill the stage
      val img =
        if (m.kind.startsWith("image/")) Option(MediaCodec.readOrNull(m.media))
        else None
      img match {
        case Some(src) =>
          val dst = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          // the payload is now BMP whatever it decoded from — the kind
          // must say so, or kind-trusting consumers (extensions,
          // content-type headers, routing) emit mislabeled bytes
          MediaRow(m.doc_id, "image/bmp", MediaCodec.encodeBmp(dst))
        case None => m
      }
    }
  }
}

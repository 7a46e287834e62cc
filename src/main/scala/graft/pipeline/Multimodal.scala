package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with typed metadata alongside —
  * the schema/partitioning/batching is real and tested; only the actual
  * codec step is stubbed (this container has no image/audio libraries),
  * clearly marked in [[MediaCodec.decodeStub]] as a deterministic fake.
  *
  * Scale notes: blobs ride in their own column so parquet column pruning
  * skips them unless touched; decode/feature-extraction runs as
  * `mapPartitions` over the typed Dataset — one JVM-side batch per
  * partition, the same execution shape a Pandas-UDF `mapInPandas` has in
  * PySpark. Keep media partitions small (`maxPartitionBytes`) so a
  * partition of blobs fits in executor memory.
  */
object Multimodal {

  /** A media row: opaque payload + metadata columns. */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  /** Extracted features: fixed-size descriptor + dimensions. */
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, feature: Array[Float])

  /** STUB codec: the real implementation would decode image/audio bytes
    * (JPEG/PNG/WAV...) — unavailable in this environment. This stands in
    * with a deterministic fake: dimensions from byte-length arithmetic and
    * a 8-float descriptor from rolling byte sums, so tests can pin exact
    * outputs and the distributed plumbing is exercised for real.
    */
  object MediaCodec {
    def decodeStub(m: MediaRow): MediaFeatures = {
      val n = m.media.length
      val feat = new Array[Float](8)
      var i = 0
      while (i < n) { feat(i % 8) += (m.media(i) & 0xFF).toFloat; i += 1 }
      MediaFeatures(m.doc_id, m.kind, n.toLong,
        width = 64 + n % 64, height = 64 + n % 48, feature = feat)
    }
  }

  /** Ingest: attach a binary payload column. In production this reads
    * real media files (`spark.read.format("binaryFile")`); here document
    * text bytes stand in as the payload.
    */
  def ingestFromText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("text/plain").as("kind"),
      to_binary(col("text"), lit("utf-8")).as("media"))

  /** Distributed feature extraction: typed mapPartitions over binary
    * payloads (the Scala equivalent of `mapInPandas` batch processing).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(MediaCodec.decodeStub))
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
    * into `frameBytes` chunks, keep every `everyN`-th. A real codec would
    * decode container frames; the chunking stands in, but the execution
    * shape — a flatMap over typed rows producing multiple blob rows, the
    * per-partition batch model, the downstream schema — is the real
    * thing. Output rows stay narrow until `payload` is touched (parquet
    * column pruning).
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

  /** Resize stub (the image path): deterministic byte subsampling to a
    * fixed target size in place of a real scaler — metadata and batch
    * plumbing are real, the pixel math is the clearly-marked fake.
    */
  def resizeStub(media: DataFrame, targetBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { m =>
      val n = m.media.length
      val out =
        if (n <= targetBytes) m.media
        else Array.tabulate(targetBytes)(i => m.media((i.toLong * n / targetBytes).toInt))
      MediaRow(m.doc_id, m.kind, out)
    }
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch
  * iteration, output shape — is real and tested; the actual media codecs
  * are NOT available in this environment, so the byte→pixels decode step
  * is a clearly-marked deterministic fake ([[fakeDecode]]) with the same
  * signature a libjpeg/ffmpeg-backed implementation would have. Swap
  * [[fakeDecode]] for a real codec and everything downstream holds.
  *
  * Scale notes: media rows are large — [[spreadBlobs]] repartitions by
  * id at INGEST so blobs spread evenly (no skewed partitions of big
  * files) without forcing a byte shuffle onto metadata-only readers,
  * and feature extraction is `mapPartitions` so any per-partition codec
  * init (model load, decoder context) amortizes across the batch, the
  * same reason the PySpark equivalent uses `mapInPandas`.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      features: Array[Float])

  val mediaSchema: StructType = Encoders.product[MediaRow].schema

  /** Build a media table from the documents fixture: text bytes stand in
    * for encoded media; metadata is derived deterministically so an
    * oracle can reproduce it (width/height from byte length, format from
    * id). Real ingests would read blob files + sidecar metadata.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      element_at(array(lit("jpeg"), lit("png"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      (octet_length(col("text").cast("binary")) % 640 + 32).cast("int").as("width"),
      (octet_length(col("text").cast("binary")) % 480 + 24).cast("int").as("height"),
      (octet_length(col("text").cast("binary")) % 16 + 1).cast("int").as("n_frames"))

  /** Opt-in blob spreading for INGEST time: repartition by media id so
    * large blobs spread evenly before a write. Deliberately not part of
    * [[mediaFromDocuments]] — an unconditional repartition there would
    * full-shuffle the media bytes on every read, even for metadata-only
    * projections (q22/q23) that never touch the blob.
    */
  def spreadBlobs(media: DataFrame): DataFrame =
    media.repartition(col("media_id"))

  /** STUB — deterministic fake decode: a real implementation calls the
    * image/audio codec here (bytes → pixel/sample array). The fake folds
    * the bytes into an 8-bin byte-value histogram normalized to [0,1] so
    * tests have stable expected values.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    if (bytes == null || bytes.isEmpty) return hist
    bytes.foreach { b => hist(((b & 0xff) >> 5)) += 1f }
    val n = bytes.length.toFloat
    hist.map(_ / n)
  }

  /** Feature extraction over media batches: one decoder pass per
    * partition (`mapPartitions`, the Scala analogue of `mapInPandas`
    * batching).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media", "format").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes, fmt) =>
          MediaFeatures(id, fmt,
            if (bytes == null) 0L else bytes.length.toLong,
            fakeDecode(bytes))
        }
      }
  }

  final case class ResizedMedia(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      media: Array[Byte])

  /** STUB — deterministic fake resize: a real implementation decodes and
    * nearest-neighbor/bilinear-resamples pixels here. The fake
    * nearest-neighbor-subsamples the BYTE STREAM to `tw*th` bytes
    * (out(i) = bytes((i*n)/(tw*th)), integer division) — the same
    * index mapping a 1-D nearest-neighbor resampler applies, replayable
    * exactly by the SQL oracle.
    */
  def fakeResize(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val outLen = tw * th
    if (bytes == null || bytes.isEmpty) return Array.emptyByteArray
    val n = bytes.length.toLong
    Array.tabulate(outLen)(i => bytes(((i.toLong * n) / outLen).toInt))
  }

  /** Resize stage over media batches: `mapPartitions` like
    * [[extractFeatures]], so a real codec's decoder/encoder context
    * initializes once per partition. Output metadata carries the target
    * dimensions; blob bytes are the resized payload.
    */
  def resizeMedia(
      spark: SparkSession, media: DataFrame, tw: Int, th: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(tw > 0 && th > 0, "target dimensions must be positive")
    media.select("media_id", "media", "format").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes, fmt) =>
          ResizedMedia(id, fmt, tw, th, fakeResize(bytes, tw, th))
        }
      }
  }

  /** Frame sampling for "video" rows: split the blob into `n_frames`
    * chunks and emit (media_id, frame_idx, frame_bytes) — the
    * explode-shaped generator a real frame sampler produces.
    */
  def sampleFrames(media: DataFrame): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame",
        expr("substring(media, frame_idx * (octet_length(media) div n_frames) + 1, " +
          "octet_length(media) div n_frames)"))
      .select(col("media_id"), col("frame_idx"), col("frame"))
}

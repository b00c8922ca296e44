package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch
  * iteration, output shape — is real and tested. IMAGE decode/resize is
  * REAL where the JDK can do it: `javax.imageio` (PNG/BMP/GIF/JPEG,
  * zero new dependencies) backs [[decodeOrFake]]/[[resizeOrFake]], and
  * q123 hash-gates the decode path end to end against a SQL replay of
  * [[syntheticPng]]'s arithmetic pixels (PNG is lossless, so the gate
  * doubles as an encode→decode roundtrip proof). Bytes no reader
  * recognizes — including the text-backed fixture rows and any codec
  * this environment lacks (ffmpeg-class video/audio) — degrade to the
  * clearly-marked deterministic fakes ([[fakeDecode]]/[[fakeResize]])
  * with identical output shape, so a decode failure downgrades a row,
  * never kills a job.
  *
  * Scale notes: media rows are large — [[spreadBlobs]] repartitions by
  * id at INGEST so blobs spread evenly (no skewed partitions of big
  * files) without forcing a byte shuffle onto metadata-only readers,
  * and feature extraction is `mapPartitions` so any per-partition codec
  * init (model load, decoder context) amortizes across the batch, the
  * same reason the PySpark equivalent uses `mapInPandas`.
  */
object Multimodal {

  // JVM-once: ImageIO's default InputStream cache is DISK-backed — a
  // temp file per decode, sensitive to tmpdir state (observed as a 13×
  // q237 board swing on unchanged code). The blobs here are small
  // in-memory byte arrays; the in-memory cache is strictly better.
  // Lives in the object body so any executor that touches a decode
  // path (module init is forced by the first call) flips it exactly
  // once per JVM.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL image decode with zero new dependencies: `javax.imageio`
    * ships in the JDK (PNG/BMP/GIF/JPEG readers). Returns None for
    * bytes no registered reader can parse (the text-backed fixture
    * rows, truncated blobs) — decode failure must degrade to the
    * fallback, not kill a 100 TB job. ImageIO sniffs magic bytes
    * before parsing, so the miss path is cheap.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      // NonFatal, not just IOException: ImageIO plugin decoders throw
      // unchecked exceptions on corrupt-but-sniffable input (absurd
      // declared dimensions → NegativeArraySize/IndexOutOfBounds) and
      // one such blob must degrade, not abort the batch
      catch { case scala.util.control.NonFatal(_) => None }

  /** Integer luminance histogram of a decoded image: 8 bins of BT.601
    * fixed-point luma `(r·299 + g·587 + b·114) div 1000` (bin = luma
    * div 32). All-integer arithmetic — replayable exactly by a SQL
    * oracle that knows the pixel values, which is what lets the real
    * decode path hash-gate end to end (q123). */
  def lumaHistogram(img: java.awt.image.BufferedImage): Array[Long] = {
    val hist = new Array[Long](8)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 5) += 1L
        x += 1
      }
      y += 1
    }
    hist
  }

  /** Pixel features from a real decode when the bytes parse, else
    * [[fakeDecode]]: the normalized 8-bin histogram keeps both paths
    * shape-identical for downstream schemas. */
  def decodeOrFake(bytes: Array[Byte]): Array[Float] =
    decodeImage(bytes) match {
      case Some(img) =>
        val n = (img.getWidth.toLong * img.getHeight).toFloat
        lumaHistogram(img).map(_ / n)
      case None => fakeDecode(bytes)
    }

  /** Deterministic synthetic PNG: dimensions and every pixel are pure
    * integer arithmetic on (id, x, y), so a SQL oracle reproduces the
    * pixel stream without decoding anything — and PNG is lossless, so
    * decode(encode(pixels)) == pixels. The golden fixture for the real
    * codec path. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (id % 5 + 3).toInt
    val h = (id % 4 + 2).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
        val g = ((id * 11 + x * 3 + y * 5) % 256).toInt
        val b = ((id * 13 + x * 17 + y * 7) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[syntheticPng]] with PLANTED near-duplicates — the golden fixture
    * for image near-dup detection: id's image is a perturbed copy of
    * base `id % nBases` (ids below nBases are the unperturbed bases).
    * Perturbation generation `mag = id / nBases` bumps the red channel
    * by `mag·40` on a sparse deterministic pixel subset, so higher
    * generations drift further from their base in hash space. Dims and
    * every pixel are integer arithmetic on (base, mag, x, y) — a SQL
    * oracle reproduces the pixel stream without any codec.
    */
  def syntheticPngVariant(id: Long, nBases: Int): Array[Byte] = {
    val base = id % nBases
    val mag = id / nBases
    val w = (base % 13 + 8).toInt
    val h = (base % 11 + 6).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r0 = (base * 7 + x * 13 + y * 31) % 256
        val r = if (mag > 0 && (x + y * w + id) % 7 == 0)
          (r0 + mag * 40) % 256 else r0
        val g = (base * 11 + x * 3 + y * 5) % 256
        val b = (base * 13 + x * 17 + y * 7) % 256
        img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic synthetic WAV (PCM16 mono LE, RIFF) with PLANTED
    * near-duplicates — the audio twin of [[syntheticPngVariant]]: id's
    * clip perturbs base `id % nBases` (ids below nBases are the bases)
    * by adding `mag²·500` on a sparse sample subset, generation
    * `mag = id / nBases`. Every sample is integer arithmetic on
    * (base, mag, t) and PCM is lossless, so a SQL oracle reproduces the
    * decoded sample stream without any codec.
    */
  def syntheticWav(id: Long, nBases: Int): Array[Byte] = {
    val base = id % nBases
    val mag = id / nBases
    val n = (1300 + (base % 7) * 130).toInt
    val data = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s0 = ((base * 37 + t * 13 + (t % 19) * (base % 23) * 31) % 4096) - 2048
      val s1 = s0 * ((t / 64 + base) % 4 + 1)
      val s = (if (mag > 0 && (t + id) % 7 == 0) s1 + mag * mag * 500 else s1).toInt
      data(2 * t) = (s & 0xff).toByte
      data(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode via the JDK's `javax.sound.sampled` — parses the
    * RIFF header and yields signed PCM16 samples; None for bytes no
    * audio reader recognizes (the [[decodeImage]] degrade contract).
    */
  def decodeWav(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = in.getFormat
      if (f.getSampleSizeInBits != 16 || f.getChannels != 1) None
      else {
        val raw = in.readAllBytes()
        val out = new Array[Int](raw.length / 2)
        var i = 0
        while (i < out.length) {
          val lo = raw(2 * i) & 0xff
          val hi = raw(2 * i + 1).toInt
          out(i) = if (f.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
                   else ((hi << 8) | lo).toShort.toInt
          i += 1
        }
        Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit audio fingerprint (Haitsma/Kalker-style, integer form):
    * split the clip into 65 equal frames (tail remainder ignored),
    * E(f) = Σ|sample|, bit f−1 = E(f) > E(f−1). Exact integer
    * arithmetic on decoded samples, SQL-replayable like [[dHash64]].
    * None for clips shorter than 65 samples (the [[decodeWav]] degrade
    * contract — a corrupt-but-parseable stub must not kill the stage).
    */
  def audioFingerprint64(samples: Array[Int]): Option[Long] = {
    val flen = samples.length / 65
    if (flen <= 0) return None
    val e = new Array[Long](65)
    var f = 0
    while (f < 65) {
      var k = 0
      var acc = 0L
      while (k < flen) {
        acc += math.abs(samples(f * flen + k).toLong)
        k += 1
      }
      e(f) = acc
      f += 1
    }
    var sig = 0L
    f = 1
    while (f < 65) {
      if (e(f) > e(f - 1)) sig |= 1L << (f - 1)
      f += 1
    }
    Some(sig)
  }

  /** 64-bit difference hash (dHash) over REAL decoded pixels — the
    * standard perceptual near-dup fingerprint for images: integer
    * nearest-neighbor resample to a 9×8 luma grid (sample (i,j) reads
    * pixel (i·w/9, j·h/8), the [[fakeResize]] index map in 2-D), then
    * bit j·8+i = luma(i+1,j) > luma(i,j). Every step is exact integer
    * arithmetic on decoded pixel values, so a lossless codec round-trip
    * makes the hash SQL-replayable from the pixel formula.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    def luma(x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
    }
    var sig = 0L
    var j = 0
    while (j < 8) {
      val sy = j * h / 8
      var i = 0
      var prev = luma(0, sy)
      while (i < 8) {
        val cur = luma((i + 1) * w / 9, sy)
        if (cur > prev) sig |= 1L << (j * 8 + i)
        prev = cur
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Feature extraction over media batches: one decoder pass per
    * partition (`mapPartitions`, the Scala analogue of `mapInPandas`
    * batching). Decodable blobs take the REAL `javax.imageio` path;
    * anything else falls back to the deterministic fake.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media", "format").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes, fmt) =>
          MediaFeatures(id, fmt,
            if (bytes == null) 0L else bytes.length.toLong,
            decodeOrFake(bytes))
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

  /** REAL nearest-neighbor resize for decodable images: out(x,y) =
    * in(x·w div tw, y·h div th) — a hand-rolled pixel loop, NOT the
    * AWT rendering pipeline, so the mapping is the same integer
    * arithmetic everywhere (no platform-dependent filtering), and the
    * PNG re-encode is lossless. */
  def resizeImage(img: java.awt.image.BufferedImage, tw: Int,
      th: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, img.getRGB(
          (x.toLong * img.getWidth / tw).toInt,
          (y.toLong * img.getHeight / th).toInt) & 0xffffff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real decode→resize→PNG re-encode when the bytes parse, else the
    * deterministic byte-stream fake. */
  def resizeOrFake(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] =
    decodeImage(bytes) match {
      case Some(img) => encodePng(resizeImage(img, tw, th))
      case None => fakeResize(bytes, tw, th)
    }

  /** Resize stage over media batches: `mapPartitions` like
    * [[extractFeatures]], so a real codec's decoder/encoder context
    * initializes once per partition. Output metadata carries the target
    * dimensions; blob bytes are the resized payload. Decodable blobs
    * take the REAL decode→resize→re-encode path.
    */
  def resizeMedia(
      spark: SparkSession, media: DataFrame, tw: Int, th: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(tw > 0 && th > 0, "target dimensions must be positive")
    // tw·th is an Int pixel count downstream (fakeResize tabulates an
    // array of that length, BufferedImage allocates tw·th ints) — an
    // overflowing target would throw NegativeArraySize deep in a task
    require(tw.toLong * th <= Int.MaxValue,
      s"target $tw x $th overflows the per-image pixel count")
    media.select("media_id", "media", "format").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes, fmt) =>
          ResizedMedia(id, fmt, tw, th, resizeOrFake(bytes, tw, th))
        }
      }
  }

  /** Version key for the media fingerprint chain (syntheticWav →
    * decodeWav → audioFingerprint64, syntheticPng* → dHash64). Bump the
    * digit on ANY change to those functions: cached signature artifacts
    * (OpsQueries.servedArtifact) embed this in their name, so a bump
    * orphans-and-prunes artifacts computed by superseded fingerprint
    * code instead of serving them to a hash gate that will fail. The
    * "t<digits>" shape is the ArtifactStore prune format (the same
    * contract as [[graft.ops.Similarity.TrainingCodeVersion]]).
    */
  val FingerprintCodeVersion: String = "t1"

  /** Frames per synthetic video ([[syntheticVideo]]). */
  val VideoFrames = 8

  /** Container magic for the synthetic video format ("GVID"). */
  val VideoMagic = 0x47564944

  /** Deterministic synthetic "video" with PLANTED near-duplicates —
    * the video leg completing the multimodal near-dup triad
    * ([[syntheticPngVariant]] images / [[syntheticWav]] audio): a
    * length-prefixed container (int32 magic, int32 frame count, then
    * per frame int32 length + a REAL PNG) of [[VideoFrames]] frames
    * whose dims and every pixel are integer arithmetic on
    * (base, generation, frame content c, x, y). id's video perturbs
    * base `id % nBases` (ids below nBases are the bases), generation
    * `mag = id / nBases`:
    *
    *  - mag 1 — sparse 1-in-29 pixel red bump of +40: a near-dup that
    *    a per-frame Hamming-3 matcher must detect;
    *  - mag 2 — the SAME sparse bump plus a TEMPORAL SHIFT of one
    *    frame (frame f displays content max(f−1, 0)) — invisible to an
    *    exact-alignment matcher, detectable only with ±1 frame
    *    tolerance (OpsSpec pins exact-alignment recall = 0 on it);
    *  - mag 3 — a dense (1-in-5) 3×-magnitude bump (+120) that drifts
    *    every video out of radius (the must-miss control).
    *
    * PNG is lossless, so a SQL oracle reproduces every frame's pixel
    * stream — and therefore every dHash bit — with no codec.
    */
  def syntheticVideo(id: Long, nBases: Int): Array[Byte] = {
    val base = id % nBases
    val mag = id / nBases
    val shift = if (mag == 2) 1 else 0
    val (step, pmag) =
      if (mag == 0) (0L, 0L) else if (mag == 3) (5L, 3L) else (29L, 1L)
    videoContainer(id, base, shift, step, pmag)
  }

  /** [[syntheticVideo]]'s sweep twin for the q246 calibration curve:
    * no temporal shift, fixed +40 bump, perturbation DENSITY graded by
    * generation (`step` ladder 47/31/19/13 — sparser to denser; density
    * is what moves a dHash, a bump magnitude mostly wraps mod 256).
    * Detected curve on the fixture: 100/95/58/2 of 100 per generation.
    */
  def syntheticVideoSweep(id: Long, nBases: Int): Array[Byte] = {
    val base = id % nBases
    val mag = (id / nBases).toInt
    val step = Seq(0L, 47L, 31L, 19L, 13L)(mag)
    videoContainer(id, base, shift = 0, step = step,
      pmag = if (mag == 0) 0L else 1L)
  }

  /** Shared container builder: [[VideoFrames]] frames of arithmetic
    * pixels, perturbed on the sparse `(x + y·w + id + c) % step == 0`
    * subset by `pmag·40` red, frame f displaying content
    * `max(f − shift, 0)`. */
  private def videoContainer(id: Long, base: Long, shift: Int, step: Long,
      pmag: Long): Array[Byte] = {
    val w = (base % 5 + 8).toInt
    val h = (base % 4 + 6).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(VideoMagic)
    out.writeInt(VideoFrames)
    var f = 0
    while (f < VideoFrames) {
      val c = math.max(f - shift, 0).toLong
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r0 = (base * 7 + c * 53 + x * 13 + y * 31) % 256
          val r = if (step > 0 && (x + y * w + id + c) % step == 0)
            (r0 + pmag * 40) % 256 else r0
          val g = (base * 11 + c * 71 + x * 3 + y * 5) % 256
          val b = (base * 13 + c * 89 + x * 17 + y * 7) % 256
          img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
          x += 1
        }
        y += 1
      }
      val png = encodePng(img)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Demux the [[syntheticVideo]] container: magic + frame count +
    * length-prefixed frames, every length bounds-checked against the
    * remaining bytes. None for anything that doesn't parse — the
    * [[decodeImage]] degrade contract (a corrupt container downgrades
    * its row, never kills the stage).
    */
  def demuxVideo(bytes: Array[Byte]): Option[Array[Array[Byte]]] =
    try {
      if (bytes == null || bytes.length < 8) return None
      val in = java.nio.ByteBuffer.wrap(bytes)
      if (in.getInt() != VideoMagic) return None
      val n = in.getInt()
      if (n < 0 || n > 4096) return None
      val out = new Array[Array[Byte]](n)
      var f = 0
      while (f < n) {
        if (in.remaining() < 4) return None
        val len = in.getInt()
        if (len < 0 || len > in.remaining()) return None
        val buf = new Array[Byte](len)
        in.get(buf)
        out(f) = buf
        f += 1
      }
      if (in.remaining() != 0) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }

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

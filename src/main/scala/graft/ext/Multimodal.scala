package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extraction as
  * partition-wise batch transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment) with a deterministic byte-level fake; everything around
  * it — schema, batch iteration shape, partition-preserving transform,
  * output contract — is real and tested. Swapping [[fakeDecode]] for a
  * JNI/FFI codec call changes no plan shape: the transform stays a
  * narrow `mapPartitions` with no shuffle, which is exactly what you
  * want when the binary column is TBs wide.
  */
object Multimodal {

  // The media/feature schemas are defined by the constructors below
  // ([[fromDocuments]], [[extractFeatures]]) — encoder-derived, no
  // separate StructType contract to drift out of sync.

  /** STUB decode: a 16-bin byte histogram, L1-normalized. Deterministic
    * stand-in for "decode image → resize → embed". A real implementation
    * replaces only this function ( ??? boundary). */
  def fakeDecode(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    if (content == null || content.isEmpty) return hist
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val n = content.length.toDouble
    hist.map(_ / n)
  }

  /** Batched feature extraction: one pass per partition, rows streamed —
    * the Scala analogue of `mapInPandas` batch plumbing. No shuffle; a
    * real codec would amortize model/codec init per partition here.
    * Typed `Dataset.mapPartitions` (not `.rdd`): rows stay in Tungsten
    * binary form with encoder-generated (de)serialization, and the plan
    * stays a single DeserializeToObject→MapPartitions→SerializeFromObject
    * pipeline instead of an RDD boundary Catalyst can't see through. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens once (codec / model handle goes here)
        rows.map { case (id, content) =>
          (id, if (content == null) 0L else content.length.toLong,
            fakeDecode(content))
        }
      }
      .toDF("media_id", "n_bytes", "features")
  }

  /** STUB resize: re-bin a feature histogram to a coarser resolution —
    * the stand-in for "resize image to target dims" (a real codec call
    * replaces the body; the batch shape stays identical). */
  def resizeFeatures(features: Array[Double], targetBins: Int): Array[Double] = {
    if (features == null || features.isEmpty) return new Array[Double](targetBins)
    val out = new Array[Double](targetBins)
    var i = 0
    while (i < features.length) {
      out(i * targetBins / features.length) += features(i)
      i += 1
    }
    out
  }

  /** STUB frame sampling: every `stride`-th byte window of the payload —
    * the stand-in for "sample every Nth video frame". Emits
    * (media_id, frame_no, frame_bytes) with the real explode shape a
    * frame pipeline has; a codec swaps byte windows for decoded frames. */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, content) =>
          if (content == null) Iterator.empty
          else Iterator.range(0, math.max(1, (content.length + stride - 1) / stride))
            .map { f =>
              val from = f * stride
              val until = math.min(content.length, from + frameSize)
              (id, f, java.util.Arrays.copyOfRange(content, from, math.max(from, until)))
            }
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }

  // ------------------------------------------------------------- images
  // REAL codec path: javax.imageio ships with the JVM (PNG/JPEG/GIF/BMP,
  // zero added dependencies), so image decode is a genuine capability
  // here, not a stub. The synthetic fixtures below make it ORACLE-
  // CHECKABLE: pixels are a pure integer function of (id, x, y), PNG is
  // lossless, so the stats of a decoded image are exactly recomputable
  // by the SQL oracle from the same formula — any defect anywhere in
  // encode→decode→featurize breaks the cross-engine hash.

  /** Deterministic synthetic RGB pixel for image `id` at (x, y). */
  def synthRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
    val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Synthetic image dims: a pure function of the id (8–16 × 8–14). */
  def synthDims(id: Long): (Int, Int) = ((8 + id % 9).toInt, (8 + id % 7).toInt)

  /** Encode the synthetic image for `id` as real PNG bytes. */
  def encodeSynthPng(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, synthRgb(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ITU-R BT.601 luminance, integer arithmetic (engine-portable:
    * truncating division on non-negative operands == SQL `//`). */
  def lumOf(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Decoded-image features: dims, full-resolution integer-luminance
    * stats + 16-bin histogram, and the luminance sum of a deterministic
    * nearest-neighbor 8×8 resample (decode → resize → featurize). */
  final case class ImageFeatures(width: Int, height: Int, lumSum: Long,
                                 lumMin: Int, lumMax: Int, lumHist: Array[Long],
                                 lum8Sum: Long)

  /** REAL image decode via `javax.imageio`. None when the payload is not
    * a decodable image (the honest NULL row for a corrupt blob — a 100 TB
    * crawl always contains some). */
  def decodeImageFeatures(content: Array[Byte]): Option[ImageFeatures] = {
    if (content == null || content.isEmpty) return None
    javax.imageio.ImageIO.setUseCache(false) // no temp-file spills on executors
    // NonFatal, not just IOException: the ImageIO plugin readers throw
    // runtime exceptions (AIOOBE, NegativeArraySize, IllegalArgument) on
    // payloads whose magic bytes parse but whose body is corrupt — and a
    // 100 TB crawl always contains some; one such blob must not kill the
    // whole extract job through task retries
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val hist = new Array[Long](16)
    var sum = 0L
    var mn = 255
    var mx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = lumOf(img.getRGB(x, y))
        sum += l
        if (l < mn) mn = l
        if (l > mx) mx = l
        hist(l / 16) += 1
        x += 1
      }
      y += 1
    }
    // nearest-neighbor 8×8 resample: source pixel ((x*w)/8, (y*h)/8)
    var s8 = 0L
    var y8 = 0
    while (y8 < 8) {
      var x8 = 0
      while (x8 < 8) {
        s8 += lumOf(img.getRGB(x8 * w / 8, y8 * h / 8))
        x8 += 1
      }
      y8 += 1
    }
    Some(ImageFeatures(w, h, sum, mn, mx, hist, s8))
  }

  /** Synthetic PNG media table from an id column — the image-fixture
    * generator (real PNG bytes per row). */
  def synthImageMedia(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(org.apache.spark.sql.functions.col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodeSynthPng(id))))
      .toDF("media_id", "content")
  }

  /** Partition-wise REAL image feature extraction — same narrow
    * `mapPartitions` shape as [[extractFeatures]], with the actual codec
    * in the loop. Undecodable payloads yield a `decoded = false` row
    * with NULL features rather than poisoning the batch. */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          decodeImageFeatures(content) match {
            case Some(f) => (id, true, Some(f.width), Some(f.height),
              Some(f.lumSum), Some(f.lumMin), Some(f.lumMax),
              Some(f.lumHist.toSeq), Some(f.lum8Sum))
            case None => (id, false, None, None, None, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "decoded", "width", "height",
        "lum_sum", "lum_min", "lum_max", "lum_hist", "lum8_sum")
  }

  // -------------------------------------------------------------- audio
  // Same design as the image path: javax.sound.sampled ships with the
  // JVM (WAV/AIFF PCM — lossless), fixture samples are a pure integer
  // function of (id, i), so decoded stats are exactly recomputable by
  // the SQL oracle.

  /** Deterministic synthetic 16-bit PCM sample for clip `id` at frame
    * `i` (full int16 range, both signs). */
  def synthSample(id: Long, i: Int): Int =
    (((id * 131 + i.toLong * 97) % 65536L) - 32768L).toInt

  /** Synthetic clip length: a pure function of the id (64–127 frames). */
  def synthFrames(id: Long): Int = (64 + id % 64).toInt

  /** Encode the synthetic clip for `id` as a real WAV file (PCM 16-bit
    * signed little-endian, mono, 8 kHz). */
  /** The `javax.sound.sampled.spi` providers, resolved ONCE per JVM.
    * `AudioSystem.write`/`getAudioInputStream` re-enter the JDK's
    * SYNCHRONIZED provider registry on every call — at 32 codec threads
    * the lock serializes the whole stage (measured: ~2-3 ms of blocked
    * wall per 200-byte clip; the 100× bench spent 36 s just ENCODING
    * its fixture). The provider instances themselves (WaveFileWriter /
    * WaveFileReader) are stateless and thread-safe, so resolving them
    * once through the public ServiceLoader SPI and calling them
    * directly is the same real codec minus the global lock. */
  private lazy val wavWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result().filter(_.isFileTypeSupported(
      javax.sound.sampled.AudioFileFormat.Type.WAVE))
  }

  /** Probe order matters: the JDK registers its MIDI-soundbank reader
    * BEFORE the WAVE readers, and its probe costs ~54 µs (it attempts a
    * full MIDI parse through another synchronized registry) versus
    * 0.6 µs for the WAVE header check — on a WAV-dominated corpus that
    * is a 90× per-row tax just to say "not MIDI". Cheap container
    * sniffs (RIFF/AIFF/AU) go first; a reader that accepts a stream
    * yields the same samples regardless of probe order. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    val (wave, rest) = b.result().partition(_.getClass.getSimpleName.contains("Wave"))
    val (cheap, costly) = rest.partition(r =>
      !r.getClass.getSimpleName.contains("Midi"))
    wave ++ cheap ++ costly
  }

  def encodeSynthWav(id: Long): Array[Byte] = {
    val n = synthFrames(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = synthSample(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriters.headOption match {
      case Some(w) =>
        w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      case None => // no SPI provider visible (exotic runtime): registry path
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    }
    bos.toByteArray
  }

  /** Decoded-audio features: frame count, sample rate, and integer
    * sample stats (sum, sum of absolute values, min, max) — exact under
    * PCM round trip. */
  final case class AudioFeatures(nFrames: Long, sampleRateHz: Long,
                                 sampleSum: Long, absSum: Long,
                                 sampleMin: Int, sampleMax: Int)

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF PCM). None
    * for undecodable payloads. Only 16-bit signed LE mono is featurized
    * (the deployment contract; other formats → None rather than wrong
    * numbers). */
  def decodeAudioFeatures(content: Array[Byte]): Option[AudioFeatures] = {
    if (content == null || content.isEmpty) return None
    // NonFatal for the same reason as the image path: malformed headers
    // can throw runtime exceptions from the format parsers. Readers are
    // probed directly (the [[wavWriters]] registry-lock rationale) —
    // the same provider iteration AudioSystem runs, without its global
    // synchronization.
    var ais: javax.sound.sampled.AudioInputStream = null
    val rs = audioReaders
    var ri = 0
    while (ais == null && ri < rs.length) {
      try ais = rs(ri).getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => }
      ri += 1
    }
    if (ais == null && rs.isEmpty) // exotic runtime: registry path
      ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.isBigEndian || fmt.getEncoding !=
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) return None
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      var sum = 0L
      var abs = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var i = 0
      while (i < n) {
        val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        sum += s
        abs += math.abs(s)
        if (s < mn) mn = s
        if (s > mx) mx = s
        i += 1
      }
      if (n == 0) None
      else Some(AudioFeatures(n.toLong, fmt.getSampleRate.toLong, sum, abs, mn, mx))
    } finally ais.close()
  }

  /** Synthetic WAV media table from an id column. */
  def synthAudioMedia(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(org.apache.spark.sql.functions.col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodeSynthWav(id))))
      .toDF("media_id", "content")
  }

  /** Partition-wise REAL audio feature extraction (same narrow shape as
    * [[extractImageFeatures]]). */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          decodeAudioFeatures(content) match {
            case Some(f) => (id, true, Some(f.nFrames), Some(f.sampleRateHz),
              Some(f.sampleSum), Some(f.absSum), Some(f.sampleMin), Some(f.sampleMax))
            case None => (id, false, None, None, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "decoded", "n_frames", "sample_rate_hz",
        "sample_sum", "abs_sum", "sample_min", "sample_max")
  }

  /** Wrap a text corpus as a media table (payload = utf8 bytes) — the
    * fixture generator for this environment, which has no binary corpus. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("format"),
        length(col("text")).as("width"),
        lit(1).as("height")).as("meta"))
}

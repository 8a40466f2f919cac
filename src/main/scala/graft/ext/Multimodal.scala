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

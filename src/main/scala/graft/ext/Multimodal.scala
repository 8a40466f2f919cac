package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Typed metadata carried alongside the opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(DoubleType))))

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
    * real codec would amortize model/codec init per partition here. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      // per-partition init happens once (codec / model handle goes here)
      rows.map { r =>
        val id = r.getLong(0)
        val content = r.getAs[Array[Byte]](1)
        Row(id, if (content == null) 0L else content.length.toLong,
          fakeDecode(content))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
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

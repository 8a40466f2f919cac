package graft.queries

import graft.ext.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal-column inventory: opaque binary payload + typed metadata,
  * wrapped from the text corpus (this environment ships no binary
  * corpus; the plumbing — schema, bytes, partition-wise extract — is
  * real, the codec is a deterministic stub).
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String) =
    Multimodal.fromDocuments(Tables.table(s, dir, "documents"))

  /** Byte-level metadata over the binary column — oracle-checkable
    * (md5 over the payload bytes, octet length). */
  val mmMeta = Q("mm_meta",
    (s, dir) => media(s, dir)
      .select(
        col("media_id"),
        col("meta.format").as("format"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("media_id"),
    Some("""SELECT doc_id AS media_id, 'text/plain' AS format,
                   octet_length(encode(text)) AS n_bytes,
                   md5(text) AS content_md5
            FROM documents ORDER BY media_id"""))

  /** Partition-wise feature extraction (stubbed decode): real batch
    * plumbing, rows-only driver check; the histogram invariants are
    * pinned by ScalaTest. */
  val mmFeatures = Q("mm_features",
    (s, dir) => {
      val f = Multimodal.extractFeatures(media(s, dir))
      f.select(
        col("media_id"), col("n_bytes"),
        round(element_at(col("features"), 3), 6).as("f2"),
        round(element_at(col("features"), 7), 6).as("f6"),
        round(aggregate(col("features"), lit(0.0), (a, v) => a + v), 6).as("f_sum"))
        .orderBy("media_id")
    },
    None)

  val all: Seq[Q] = Seq(mmMeta, mmFeatures)
}

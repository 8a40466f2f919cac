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

  /** Partition-wise feature extraction: real batch plumbing, and the
    * stub decode (16-bin high-nibble byte histogram, L1-normalized) is
    * itself SQL-expressible — the oracle expands the payload to hex,
    * counts the odd-position hex digits (= high nibbles), and rebuilds
    * the same bins, so even the stub path is hash-checked. f_sum sums
    * bins in index order exactly like the Spark-side left fold. */
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
    Some {
      val digits = "0123456789ABCDEF"
      val pivots = digits.zipWithIndex.map { case (d, k) =>
        s"coalesce(max(CASE WHEN hn = '$d' THEN c END), 0) AS c$k" }
        .mkString(",\n                        ")
      val binSum = (0 until 16).map(k => s"h.c$k::DOUBLE / h.n").mkString(" + ")
      s"""WITH b AS (
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS n,
                   upper(hex(encode(text))) AS h
            FROM documents),
          nib AS (
            SELECT media_id, n, substr(h, 2 * i - 1, 1) AS hn
            FROM (SELECT media_id, n, h, unnest(generate_series(1, n)) AS i FROM b)),
          counts AS (SELECT media_id, any_value(n) AS n, hn, count(*) AS c
                     FROM nib GROUP BY media_id, hn),
          hist AS (SELECT media_id, any_value(n) AS n,
                        $pivots
                   FROM counts GROUP BY media_id)
          SELECT b.media_id, b.n::BIGINT AS n_bytes,
                 CASE WHEN b.n = 0 THEN 0.0 ELSE round(h.c2::DOUBLE / h.n, 6) END AS f2,
                 CASE WHEN b.n = 0 THEN 0.0 ELSE round(h.c6::DOUBLE / h.n, 6) END AS f6,
                 CASE WHEN b.n = 0 THEN 0.0 ELSE round(0.0 + $binSum, 6) END AS f_sum
          FROM b LEFT JOIN hist h ON b.media_id = h.media_id
          ORDER BY b.media_id"""
    })

  /** REAL image decode, oracle-checked end to end: the fixture encodes a
    * deterministic synthetic image per document as true PNG bytes
    * (javax.imageio), the query DECODES those bytes back (javax.imageio
    * again) and emits dims + luminance stats + 16-bin histogram + an 8×8
    * nearest-neighbor-resample sum. PNG is lossless and the pixels are a
    * pure integer function of (id, x, y), so DuckDB recomputes every
    * number from the formula — any defect in the codec round trip or the
    * featurization breaks the cross-engine hash. */
  val mmImageFeatures = Q("mm_image_features",
    (s, dir) => {
      val feats = Multimodal.extractImageFeatures(Fixtures.pngMedia(s, dir))
      feats.select(
        col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("lum_sum"),
        col("lum_min").cast("long").as("lum_min"),
        col("lum_max").cast("long").as("lum_max"),
        concat_ws(",", col("lum_hist").cast("array<string>")).as("lum_hist"),
        col("lum8_sum"))
        .orderBy("media_id")
    },
    Some {
      // the same integer-luminance formula over the same synthetic pixels,
      // in pure SQL (generate_series lists; DuckDB 1.0 has no lateral
      // generate_series in FROM)
      def lum(xe: String, ye: String) =
        s"""(299 * ((media_id * 31 + ($xe) * 7 + ($ye) * 13) % 256)
           + 587 * ((media_id * 17 + ($xe) * 11 + ($ye) * 3) % 256)
           + 114 * ((media_id * 23 + ($xe) * 5 + ($ye) * 19) % 256)) // 1000"""
      s"""WITH dims AS (
            SELECT doc_id AS media_id,
                   8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
            FROM documents),
          px AS (
            SELECT media_id, w, h,
                   flatten(list_transform(generate_series(0, h - 1), y ->
                     list_transform(generate_series(0, w - 1), x ->
                       ${lum("x", "y")}))) AS lums,
                   flatten(list_transform(generate_series(0, 7), y ->
                     list_transform(generate_series(0, 7), x ->
                       ${lum("x * w // 8", "y * h // 8")}))) AS lums8
            FROM dims)
          SELECT media_id,
                 CAST(w AS BIGINT) AS width,
                 CAST(h AS BIGINT) AS height,
                 CAST(list_sum(lums) AS BIGINT) AS lum_sum,
                 CAST(list_min(lums) AS BIGINT) AS lum_min,
                 CAST(list_max(lums) AS BIGINT) AS lum_max,
                 array_to_string(list_transform(generate_series(0, 15), b ->
                   len(list_filter(lums, l -> l // 16 = b))), ',') AS lum_hist,
                 CAST(list_sum(lums8) AS BIGINT) AS lum8_sum
          FROM px ORDER BY media_id"""
    })

  /** REAL audio decode, oracle-checked the same way as
    * [[mmImageFeatures]]: deterministic 16-bit PCM clips encoded as true
    * WAV files (javax.sound.sampled), decoded back, integer sample stats
    * recomputed by DuckDB from the sample formula — PCM is lossless, so
    * the hashes pin the whole codec round trip. */
  val mmAudioFeatures = Q("mm_audio_features",
    (s, dir) => {
      val feats = Multimodal.extractAudioFeatures(Fixtures.wavMedia(s, dir))
      feats.select(
        col("media_id"),
        col("n_frames"),
        col("sample_rate_hz"),
        col("sample_sum"),
        col("abs_sum"),
        col("sample_min").cast("long").as("sample_min"),
        col("sample_max").cast("long").as("sample_max"))
        .orderBy("media_id")
    },
    Some(s"""WITH dims AS (
               SELECT doc_id AS media_id, 64 + doc_id % 64 AS n FROM documents),
             s AS (
               SELECT media_id, n,
                      list_transform(generate_series(0, n - 1), i ->
                        ((media_id * 131 + i * 97) % 65536) - 32768) AS samples
               FROM dims)
           SELECT media_id,
                  CAST(n AS BIGINT) AS n_frames,
                  CAST(8000 AS BIGINT) AS sample_rate_hz,
                  CAST(list_sum(samples) AS BIGINT) AS sample_sum,
                  CAST(list_sum(list_transform(samples, x -> abs(x))) AS BIGINT) AS abs_sum,
                  CAST(list_min(samples) AS BIGINT) AS sample_min,
                  CAST(list_max(samples) AS BIGINT) AS sample_max
           FROM s ORDER BY media_id"""))

  private val FrameSize = 32
  private val FrameStride = 24

  /** Frame sampling over the binary payload ([[Multimodal.sampleFrames]]
    * — the "sample every Nth video frame" explode shape: one pass per
    * partition, one output row per frame, frames overlap by
    * FrameSize − FrameStride bytes). The oracle rebuilds every byte
    * window with character substrings (the corpus payload is ASCII
    * text-as-bytes, so char offsets ARE byte offsets) and md5-checks the
    * exact frame bytes. */
  val mmFrameSample = Q("mm_frame_sample",
    (s, dir) => Multimodal.sampleFrames(media(s, dir), FrameSize, FrameStride)
      .select(col("media_id"), col("frame_no"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("media_id", "frame_no"),
    Some(s"""WITH b AS (
               SELECT doc_id AS media_id, text,
                      octet_length(encode(text)) AS n
               FROM documents),
             f AS (
               SELECT media_id, text, n,
                      unnest(generate_series(0,
                        greatest(1, (n + ${FrameStride - 1}) // $FrameStride) - 1))
                        AS frame_no
               FROM b)
           SELECT media_id, CAST(frame_no AS INT) AS frame_no,
                  CAST(least(n, frame_no * $FrameStride + $FrameSize)
                       - frame_no * $FrameStride AS BIGINT) AS frame_len,
                  md5(substr(text, frame_no * $FrameStride + 1,
                      least(n, frame_no * $FrameStride + $FrameSize)
                      - frame_no * $FrameStride)) AS frame_md5
           FROM f ORDER BY media_id, frame_no"""))

  val all: Seq[Q] = Seq(mmMeta, mmFeatures, mmImageFeatures, mmAudioFeatures,
    mmFrameSample)
}

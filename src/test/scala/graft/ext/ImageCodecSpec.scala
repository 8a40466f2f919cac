package graft.ext

import graft.SparkSpec

/** The REAL image codec path (javax.imageio): decoding an
  * externally-encoded committed PNG (written by an independent pure-zlib
  * encoder, not ImageIO) must reproduce its golden pixel stats, and the
  * synthetic encode→decode round trip must match the pixel formula the
  * SQL oracle uses. */
class ImageCodecSpec extends SparkSpec {

  test("committed external PNG decodes to its golden stats") {
    val in = getClass.getResourceAsStream("/fixture_rgb_5x4.png")
    assert(in != null, "committed fixture missing")
    val bytes = in.readAllBytes()
    in.close()
    val f = Multimodal.decodeImageFeatures(bytes).get
    assert(f.width == 5 && f.height == 4)
    assert(f.lumSum == 2503L && f.lumMin == 0 && f.lumMax == 255)
    assert(f.lumHist.toSeq == Seq(1L, 0L, 1L, 1L, 1L, 1L, 3L, 2L, 3L, 2L, 3L, 0L, 0L, 0L, 1L, 1L))
    assert(f.lum8Sum == 7812L)
  }

  test("synthetic PNG round trip reproduces the oracle's pixel formula") {
    for (id <- Seq(1L, 7L, 123L, 4999L)) {
      val (w, h) = Multimodal.synthDims(id)
      val f = Multimodal.decodeImageFeatures(Multimodal.encodeSynthPng(id)).get
      assert(f.width == w && f.height == h)
      // recompute the expected stats straight from the formula
      val lums = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.lumOf(Multimodal.synthRgb(id, x, y))
      assert(f.lumSum == lums.map(_.toLong).sum)
      assert(f.lumMin == lums.min && f.lumMax == lums.max)
      val hist = new Array[Long](16)
      lums.foreach(l => hist(l / 16) += 1)
      assert(f.lumHist.toSeq == hist.toSeq)
      val s8 = (for (y8 <- 0 until 8; x8 <- 0 until 8)
        yield Multimodal.lumOf(
          Multimodal.synthRgb(id, x8 * w / 8, y8 * h / 8)).toLong).sum
      assert(f.lum8Sum == s8)
    }
  }

  test("committed external WAV decodes to its golden stats") {
    val in = getClass.getResourceAsStream("/fixture_pcm16.wav")
    assert(in != null, "committed fixture missing")
    val bytes = in.readAllBytes()
    in.close()
    val f = Multimodal.decodeAudioFeatures(bytes).get
    assert(f.nFrames == 10L && f.sampleRateHz == 8000L)
    assert(f.sampleSum == 7004L && f.absSum == 86196L)
    assert(f.sampleMin == -32768 && f.sampleMax == 32767)
  }

  test("synthetic WAV round trip reproduces the oracle's sample formula") {
    for (id <- Seq(1L, 63L, 64L, 4999L)) {
      val f = Multimodal.decodeAudioFeatures(Multimodal.encodeSynthWav(id)).get
      val n = Multimodal.synthFrames(id)
      val samples = (0 until n).map(i => Multimodal.synthSample(id, i))
      assert(f.nFrames == n.toLong && f.sampleRateHz == 8000L)
      assert(f.sampleSum == samples.map(_.toLong).sum)
      assert(f.absSum == samples.map(s => math.abs(s).toLong).sum)
      assert(f.sampleMin == samples.min && f.sampleMax == samples.max)
    }
  }

  test("undecodable payloads yield None / decoded=false rows, not failures") {
    assert(Multimodal.decodeImageFeatures(null).isEmpty)
    assert(Multimodal.decodeImageFeatures(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImageFeatures("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeAudioFeatures(null).isEmpty)
    assert(Multimodal.decodeAudioFeatures("not a wav".getBytes).isEmpty)
    // a PNG is not PCM audio and vice versa — the codecs don't cross-fire
    assert(Multimodal.decodeAudioFeatures(Multimodal.encodeSynthPng(1L)).isEmpty)
    assert(Multimodal.decodeImageFeatures(Multimodal.encodeSynthWav(1L)).isEmpty)
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.encodeSynthPng(1L)),
      (2L, "garbage".getBytes)).toDF("media_id", "content")
    val rows = Multimodal.extractImageFeatures(media)
      .orderBy("media_id").collect()
    assert(rows(0).getAs[Boolean]("decoded"))
    assert(!rows(1).getAs[Boolean]("decoded") && rows(1).isNullAt(rows(1).fieldIndex("width")))
  }
}

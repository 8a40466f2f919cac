package graft.tools

/** JVM-only microbench of the WAV codec hot path (no Spark): per-row
  * encode/decode cost at 1 and N threads, to attribute the mm_audio
  * 100× multiple to codec vs plumbing. */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val threads = if (args.length > 1) args(1).toInt else 32
    val wavs = (0L until 1000L).map(graft.ext.Multimodal.encodeSynthWav).toArray
    def decodeLoop(count: Int): Long = {
      var ok = 0L
      var i = 0
      while (i < count) {
        if (graft.ext.Multimodal.decodeAudioFeatures(wavs(i % 1000)).isDefined) ok += 1
        i += 1
      }
      ok
    }
    // reader inventory + step split
    val readers = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      b.result()
    }
    println(s"readers: ${readers.map(_.getClass.getName).mkString(", ")}")
    def step(tag: String)(body: () => Unit): Unit = {
      var i = 0; val t0 = System.nanoTime()
      while (i < 50000) { body(); i += 1 }
      println(f"  $tag%-28s ${(System.nanoTime() - t0) / 1e3 / 50000}%8.2f us")
    }
    for (r <- readers) {
      step(s"probe ${r.getClass.getSimpleName}") { () =>
        try { r.getAudioInputStream(
          new java.io.ByteArrayInputStream(wavs(0))).close() }
        catch { case _: Exception => }
      }
    }
    // warmup
    decodeLoop(20000)
    var t0 = System.nanoTime()
    decodeLoop(n)
    println(f"decode 1-thread:  ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/row")
    t0 = System.nanoTime()
    val ts = (1 to threads).map(_ => new Thread(() => { decodeLoop(n / threads); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    println(f"decode $threads-thread: ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/row wall")
    t0 = System.nanoTime()
    var i = 0
    while (i < n / 10) { graft.ext.Multimodal.encodeSynthWav(i.toLong); i += 1 }
    println(f"encode 1-thread:  ${(System.nanoTime() - t0) / 1e3 / (n / 10)}%8.2f us/row")
  }
}

package graft.ext

/** Test helper: byte-level snapshot of a shard directory — file name →
  * (size, content md5). Lets specs assert the append contract literally:
  * pre-existing shard files are untouched, not merely row-equivalent.
  */
object ShardFiles {

  def snapshot(dir: String): Map[String, (Long, String)] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.isFile).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      f.getName -> (f.length(), md5)
    }.toMap
  }
}

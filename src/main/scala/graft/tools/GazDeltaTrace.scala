package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage trace for g16's cost structure: template build, clone
  * copy, refreshDelta, read-back — to localize wall time that job
  * counts don't explain.
  *
  *   sbt "runMain graft.tools.GazDeltaTrace [sfDir]"
  */
object GazDeltaTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val raw = part.join(customer, col("p_partkey") === col("c_custkey"))
      .select(
        col("p_partkey").cast("long").as("id"),
        col("p_name").as("name"),
        map_from_arrays(array(lit("amenity"), lit("name")),
          array(lower(col("p_type")), col("p_name"))).as("tags"),
        concat(lit("POINT("),
          (lit(-180.0) + (col("c_custkey") * 73 % 36000) / 100.0), lit(" "),
          (lit(-85.0) + (col("c_custkey") * 37 % 17000) / 100.0), lit(")"))
          .as("wkt"))

    for (p <- 1 to 2) {
      println(s"pass $p:")
      val tmpl = graft.core.TempDirs.create("graft-gazdt-tmpl-")
      t("template build") {
        graft.etl.GazetteerBuilder.writeVersionedPartitioned(spark, raw, tmpl)
      }
      val bytes = t("template du") {
        def du(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
          else f.length
        du(new java.io.File(tmpl))
      }
      println(f"  template bytes        ${bytes / 1e6}%8.1f MB")
      val clone = graft.core.TempDirs.create("graft-gazdt-clone-")
      t("clone copy") {
        def copy(src: java.io.File, dst: java.io.File): Unit =
          if (src.isDirectory) {
            dst.mkdirs()
            Option(src.listFiles).foreach(_.foreach(f =>
              copy(f, new java.io.File(dst, f.getName))))
          } else {
            java.nio.file.Files.copy(src.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING); ()
          }
        copy(new java.io.File(tmpl), new java.io.File(clone))
      }
      val maxId = t("maxId agg") { raw.agg(max(col("id"))).head.getLong(0) }
      val win = math.max(100L, maxId / 1000L)
      def retag(df: org.apache.spark.sql.DataFrame) = df.withColumn("tags",
        map_from_arrays(array(lit("amenity"), lit("name")),
          array(element_at(col("tags"), "amenity"), col("name"))))
      val local = raw.filter(col("id") <= win)
      val feed = retag(local.filter(col("id") % 3 === 0)
          .withColumn("name", concat(col("name"), lit(" annex"))))
          .withColumn("op", lit("U"))
        .unionByName(local.filter(col("id") % 3 === 1).withColumn("op", lit("D")))
        .unionByName(retag(local.filter(col("id") % 3 === 2)
          .withColumn("id", col("id") + lit(maxId + 1L))
          .withColumn("name", concat(lit("new "), col("name"))))
          .withColumn("op", lit("I")))
      t("refreshDelta") {
        graft.etl.GazetteerBuilder.refreshDelta(spark, clone, feed)
      }
      val resolved = t("resolveCurrent") {
        graft.ext.VersionedStore.resolveCurrent(spark, clone)
      }
      t("readPois.orderBy.collect") {
        graft.etl.GazetteerBuilder.readPois(spark, resolved)
          .select(col("osm_id"), col("name_local")).orderBy("osm_id").collect()
      }
    }
    spark.stop()
  }
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (ext/ZOrder): column/driver key parity, the bbox
  * cover property, and the thing the layout exists for — directory
  * pruning visible in the file listing of a bbox probe.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("column zValue equals the driver-side twin on a coordinate grid") {
    val pts = (for (la <- -90 to 90 by 17; lo <- -180 to 180 by 23)
      yield (la.toDouble + 0.25, lo.toDouble + 0.75)).toSeq
    val got = pts.toDF("lat", "lon")
      .select(col("lat"), col("lon"), ZOrder.zValue(col("lat"), col("lon")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder.zValueOf(r.getDouble(0), r.getDouble(1)),
        s"mismatch at (${r.getDouble(0)}, ${r.getDouble(1)})")
    }
  }

  test("bit interleave is exact: low cells map to the expected Morton keys") {
    // cell size: lat 180/2^16, lon 360/2^16. Pick coordinates landing in
    // known small cells: cell index 1 for lat needs lat-(-90) in
    // [180/65536, 2*180/65536)
    val latCell1 = -90.0 + 1.5 * 180.0 / 65536.0
    val lonCell2 = -180.0 + 2.5 * 360.0 / 65536.0
    // lon on even bits: cell 2 -> binary 10 -> spread 0b100 = 4
    // lat on odd bits: cell 1 -> spread 1, shifted -> 0b10 = 2
    assert(ZOrder.zValueOf(-90.0, lonCell2) == 4L)
    assert(ZOrder.zValueOf(latCell1, -180.0) == 2L)
    assert(ZOrder.zValueOf(latCell1, lonCell2) == 6L)
    // extremes clamp into the top cell, not overflow
    assert(ZOrder.zValueOf(90.0, 180.0) == (1L << 32) - 1)
  }

  test("every in-box point's key falls inside the corner-key cover") {
    val (minLat, maxLat, minLon, maxLon) = (-12.0, 33.0, 45.0, 128.0)
    val (lo, hi) = ZOrder.zRangeOf(minLat, maxLat, minLon, maxLon)
    val inBox = for (i <- 0 until 500) yield {
      val la = minLat + (maxLat - minLat) * ((i * 37 % 101) / 100.0)
      val lo2 = minLon + (maxLon - minLon) * ((i * 53 % 103) / 102.0)
      (la, lo2)
    }
    inBox.foreach { case (la, lon) =>
      val z = ZOrder.zValueOf(la, lon)
      assert(z >= lo && z <= hi, s"key $z outside cover [$lo,$hi] at ($la,$lon)")
    }
  }

  test("layout prunes directories on a bbox probe and loses no rows") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-zorder-spec").toString + "/tbl"
    // full-globe grid so every zp directory is populated — pruning has
    // something to prune (the sf fixtures cluster into a corner)
    val pois = (for (la <- -89 to 89 by 2; lo <- -179 to 179 by 2)
      yield ((la.toLong + 90) * 1000 + lo + 180, la + 0.5, lo + 0.5))
      .toDF("c_custkey", "lat", "lon")
    ZOrder.layout(pois, path, prefixBits = 3)
    val stored = spark.read.parquet(path)
    val (minLat, maxLat, minLon, maxLon) = (10.0, 40.0, 20.0, 60.0)
    val probed = ZOrder.bboxFilter(stored, minLat, maxLat, minLon, maxLon)
    // pruning: the executed scan must SELECT fewer zp partition dirs
    // than the table holds (directory pruning — before any I/O)
    def partitionsRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head.metrics("numPartitions").value
    }
    val total = partitionsRead(stored)
    val pruned = partitionsRead(probed)
    assert(total > 4, s"fixture must span multiple partition dirs, got $total")
    assert(pruned < total, s"no pruning: $pruned of $total partitions")
    // correctness: exactly the rows a plain filter finds
    val plain = pois.filter(col("lat").between(minLat, maxLat) &&
        col("lon").between(minLon, maxLon))
      .select("c_custkey").orderBy("c_custkey").collect()
    val viaZ = probed.select("c_custkey").orderBy("c_custkey").collect()
    assert(plain.nonEmpty && viaZ.sameElements(plain))
  }

}

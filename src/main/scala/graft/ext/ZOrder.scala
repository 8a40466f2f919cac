package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) spatial layout — the multi-dimensional clustering
  * lever the 1-D `repartitionByRange(lat, lon)` layout
  * ([[graft.etl.GazetteerBuilder]]) cannot provide: range layout
  * clusters by lat first, so a bbox narrow in LONGITUDE still reads
  * every file of the matching lat stripe. Interleaving the bits of the
  * two coordinate cells gives one sort key along which both dimensions
  * cluster, so 2-D bbox predicates prune in both axes — the technique
  * object-store table formats expose as `OPTIMIZE ... ZORDER BY`.
  *
  * Everything is integer bit arithmetic over fixed [-90,90]/[-180,180]
  * cells (no floats past the initial cell binning, which is
  * correctly-rounded IEEE ops), so the driver-side range computation
  * ([[zRangeOf]]) and the column expression ([[zValue]]) agree bit for
  * bit, and a DuckDB oracle can replay the binning exactly.
  *
  * At 100 TB: [[layout]] writes the table `zp`-partitioned (the top
  * 2·prefixBits of z as a Hive partition column → DIRECTORY pruning at
  * file listing, before any I/O) and z-sorted within partitions (→
  * Parquet row-group pruning via min/max stats on the retained files).
  * A bbox query pushes three predicates: zp BETWEEN (prunes dirs),
  * z BETWEEN (prunes row groups), and the exact lat/lon bounds (final
  * filter — the z range is a cover, not exact, because Z-curve jumps
  * admit out-of-box cells between the corner keys). */
object ZOrder {

  /** Coordinate → cell index in [0, 2^bits): linear binning with
    * clamp, `floor` + IEEE ops only so Scala/SQL twins agree. */
  def cell(v: Column, min: Double, max: Double, bits: Int): Column = {
    val n = 1 << bits
    least(lit(n - 1), greatest(lit(0),
      floor((v - lit(min)) / lit(max - min) * lit(n.toDouble)).cast("int")))
  }

  /** Driver-side twin of [[cell]] — same expression tree, same IEEE
    * semantics. */
  def cellOf(v: Double, min: Double, max: Double, bits: Int): Int = {
    val n = 1 << bits
    math.min(n - 1, math.max(0, math.floor((v - min) / (max - min) * n).toInt))
  }

  /** Spread a 16-bit value so bit i lands at position 2i (the classic
    * part1by1 mask cascade — 8 integer ops, one codegen expression). */
  private def spread(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  private def spreadOf(v: Int): Long = {
    val x0 = v.toLong & 0xFFFFL
    val x1 = (x0 | (x0 << 8)) & 0x00FF00FFL
    val x2 = (x1 | (x1 << 4)) & 0x0F0F0F0FL
    val x3 = (x2 | (x2 << 2)) & 0x33333333L
    (x3 | (x3 << 1)) & 0x55555555L
  }

  /** Morton key of a (lat, lon) pair at `bits` bits per dimension
    * (max 16 → a 32-bit key in a long): lon cell on even bit
    * positions, lat cell on odd. */
  def zValue(lat: Column, lon: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    spread(cell(lon, -180.0, 180.0, bits))
      .bitwiseOR(shiftleft(spread(cell(lat, -90.0, 90.0, bits)), 1))
  }

  /** Driver-side twin of [[zValue]]. */
  def zValueOf(lat: Double, lon: Double, bits: Int = 16): Long =
    spreadOf(cellOf(lon, -180.0, 180.0, bits)) |
      (spreadOf(cellOf(lat, -90.0, 90.0, bits)) << 1)

  /** The inclusive z-key cover of a bbox: interleaving is monotone in
    * each cell argument, so every in-box point's key lies between the
    * two corner keys. The range covers MORE than the box (Z jumps);
    * callers keep the exact lat/lon predicate behind it. */
  def zRangeOf(minLat: Double, maxLat: Double,
               minLon: Double, maxLon: Double, bits: Int = 16): (Long, Long) =
    (zValueOf(minLat, minLon, bits), zValueOf(maxLat, maxLon, bits))

  /** Write `df` (needs `lat`/`lon` columns) z-order-clustered at
    * `path`: `zp` (top 2·prefixBits of z) as a Hive partition column
    * for directory pruning, rows z-sorted within each partition for
    * row-group pruning. Adds the `z` column to the stored schema (the
    * probe key must be a real column for min/max stats to exist). */
  def layout(df: DataFrame, path: String, bits: Int = 16,
             prefixBits: Int = 3, filesPerPartition: Int = 1): Unit = {
    require(prefixBits >= 1 && prefixBits <= bits,
      s"prefixBits must be in [1,$bits], got $prefixBits")
    val shift = 2 * bits - 2 * prefixBits
    df.withColumn("z", zValue(col("lat"), col("lon"), bits))
      .withColumn("zp", shiftright(col("z"), shift))
      .repartitionByRange(math.max(1, filesPerPartition) * (1 << (2 * prefixBits)),
        col("zp"), col("z"))
      .sortWithinPartitions("z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("zp").parquet(path)
  }

  /** Bbox filter against a [[layout]]-written table: zp-range
    * (directory pruning) + z-range (row-group pruning) + the exact
    * bounds. Identical rows to filtering the unclustered table — the
    * key predicates are covers, never cuts. */
  def bboxFilter(df: DataFrame, minLat: Double, maxLat: Double,
                 minLon: Double, maxLon: Double, bits: Int = 16,
                 prefixBits: Int = 3): DataFrame = {
    val (zLo, zHi) = zRangeOf(minLat, maxLat, minLon, maxLon, bits)
    val shift = 2 * bits - 2 * prefixBits
    df.filter(col("zp").between(zLo >> shift, zHi >> shift) &&
        col("z").between(zLo, zHi) &&
        col("lat").between(minLat, maxLat) &&
        col("lon").between(minLon, maxLon))
  }
}

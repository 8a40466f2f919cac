package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ISO WKB → WKT converter for the OSM ingest boundary
  * (reference: `scripts/build_gazetteer.py:158-180` shells out to
  * QuackOSM, whose GeoParquet output carries geometry as standard WKB;
  * the engine's geometry functions — [[Geo]], F10–F12 — consume WKT).
  *
  * Supports the 2D geometry types OSM data produces: Point, LineString,
  * Polygon, MultiPoint, MultiLineString, MultiPolygon and
  * GeometryCollection, either byte order, with or without the EWKB
  * SRID flag (QuackOSM writes plain ISO WKB; PostGIS exports add SRID).
  * Z/M dimensions are rejected loudly — OSM is 2D, and silently
  * dropping a dimension would corrupt coordinates.
  *
  * Build-time-only code path (the same boundary where [[Geo]]'s WKT
  * parse UDF already lives): one call per raw feature during ingest,
  * never in a serving query.
  */
object Wkb {

  private val TypeNames = Map(
    1 -> "POINT", 2 -> "LINESTRING", 3 -> "POLYGON",
    4 -> "MULTIPOINT", 5 -> "MULTILINESTRING", 6 -> "MULTIPOLYGON",
    7 -> "GEOMETRYCOLLECTION")

  /** WKT text for a WKB blob. Throws IllegalArgumentException on
    * malformed or unsupported input — INCLUDING truncated blobs (buffer
    * underflow is rewrapped, so callers at the ingest boundary can rely
    * on one exception type to implement drop-vs-fail policy). */
  def toWkt(bytes: Array[Byte]): String = {
    require(bytes != null && bytes.length >= 5, "WKB too short")
    val sb = new StringBuilder(bytes.length)
    val buf = ByteBuffer.wrap(bytes)
    try {
      geom(buf, sb)
    } catch {
      case e: java.nio.BufferUnderflowException =>
        throw new IllegalArgumentException(s"truncated WKB (${bytes.length} bytes)", e)
    }
    require(!buf.hasRemaining, s"${buf.remaining()} trailing bytes after WKB geometry")
    sb.toString
  }

  private def num(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Reads one geometry header (order marker, type word, optional EWKB
    * SRID) and returns the base type 1–7. Every header — top level AND
    * multi-geometry members — goes through here, so an EWKB member with
    * Z/M flags or a bad order marker hits the same loud rejection as a
    * top-level one instead of misparsing coordinates. */
  private def header(buf: ByteBuffer): Int = {
    val order = buf.get()
    buf.order(
      if (order == 1) ByteOrder.LITTLE_ENDIAN
      else if (order == 0) ByteOrder.BIG_ENDIAN
      else throw new IllegalArgumentException(s"bad WKB byte-order marker $order"))
    val rawType = buf.getInt()
    if ((rawType & 0x20000000) != 0) buf.getInt() // skip EWKB SRID
    val base = rawType & 0x0FFFFFFF
    // one check covers both encodings of higher dimensions: ISO WKB
    // offsets the type by 1000/2000/3000 (base > 7) and EWKB sets the
    // Z/M flag bits (0xC0000000)
    require(base >= 1 && base <= 7 && (rawType & 0xC0000000) == 0,
      s"unsupported WKB geometry type $rawType (Z/M or unknown)")
    base
  }

  /** Validated member header for a homogeneous multi-geometry. */
  private def memberHeader(buf: ByteBuffer, expected: Int, in: String): Unit = {
    val base = header(buf)
    require(base == expected, s"$in member type $base (expected $expected)")
  }

  private def geom(buf: ByteBuffer, sb: StringBuilder): Unit = {
    val base = header(buf)
    sb.append(TypeNames(base)).append(' ')
    base match {
      case 1 => point(buf, sb)
      case 2 => ring(buf, sb)
      case 3 => rings(buf, sb)
      // each multi-geometry member carries its own full header
      case 4 => collect(buf, sb, inner = b => { memberHeader(b, 1, "MULTIPOINT"); point(b, sb) })
      case 5 => collect(buf, sb, inner = b => { memberHeader(b, 2, "MULTILINESTRING"); ring(b, sb) })
      case 6 => collect(buf, sb, inner = b => { memberHeader(b, 3, "MULTIPOLYGON"); rings(b, sb) })
      case 7 => collect(buf, sb, inner = b => geom(b, sb))
    }
  }

  /** "(x y)" */
  private def point(buf: ByteBuffer, sb: StringBuilder): Unit =
    sb.append('(').append(num(buf.getDouble)).append(' ')
      .append(num(buf.getDouble)).append(')')

  /** "(x y, x y, ...)" */
  private def ring(buf: ByteBuffer, sb: StringBuilder): Unit = {
    val n = buf.getInt()
    require(n >= 0 && n <= buf.remaining() / 16, s"bad point count $n")
    sb.append('(')
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(", ")
      sb.append(num(buf.getDouble)).append(' ').append(num(buf.getDouble))
      i += 1
    }
    sb.append(')')
  }

  /** "((ring), (ring), ...)" */
  private def rings(buf: ByteBuffer, sb: StringBuilder): Unit = {
    val n = buf.getInt()
    sb.append('(')
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(", ")
      ring(buf, sb)
      i += 1
    }
    sb.append(')')
  }

  private def collect(buf: ByteBuffer, sb: StringBuilder,
                      inner: ByteBuffer => Unit): Unit = {
    val outerOrder = buf.order()
    val n = buf.getInt()
    sb.append('(')
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(", ")
      inner(buf)
      buf.order(outerOrder) // member may have flipped the order
      i += 1
    }
    sb.append(')')
  }
}

package graft.sources.v2

import java.nio.{ByteBuffer, ByteOrder}

/** Iceberg-v3 GEOMETRY / GEOGRAPHY / UNKNOWN lake types, riding the
  * proven `graft.lake-type.<col>` mechanism:
  *
  *  - `geometry` / `geography`: the column is Spark BINARY holding WKB
  *    (2D Point / LineString / Polygon / Multi* in either byte order).
  *    The writer validates the encoding, annotates parquet with the
  *    GEOMETRY/GEOGRAPHY logical type, and records per-file bounds two
  *    ways: the spec's WKB-POINT lower/upper (x_min,y_min)/(x_max,y_max)
  *    under the column's own stat id, and FOUR synthetic DOUBLE stat
  *    fields `_geo_<col>_{xmin,ymin,xmax,ymax}` (the row's bbox edges as
  *    virtual columns). The same four names surface as metadata columns,
  *    so conservative INTERSECTS pruning is ordinary conjunct pushdown:
  *    `WHERE _geo_g_xmin <= qxmax AND _geo_g_xmax >= qxmin AND ...`
  *    skips every file whose recorded bbox cannot intersect the query
  *    window.
  *  - `unknown`: the spec's null-only type — writes refuse non-null
  *    values, reads always serve null.
  */
private[graft] object GeoLake {

  val MetaPrefix = "_geo_"
  /** Synthetic stat-field id base (variant shreds use 5000+). */
  val StatIdBase = 6000
  val Suffixes: Seq[String] = Seq("xmin", "ymin", "xmax", "ymax")

  def isGeoType(lt: String): Boolean = lt == "geometry" || lt == "geography"

  def metaName(col: String, suffix: String): String =
    s"$MetaPrefix${col}_$suffix"

  /** The geometry columns a lake-type declaration names, sorted —
    * the deterministic order stat ids derive from. */
  def geoColsOf(lakeTypes: Map[String, String]): Seq[String] =
    lakeTypes.collect { case (c, lt) if isGeoType(lt) => c }.toSeq.sorted

  /** The four synthetic (name, statId) pairs per geometry column. */
  def geoStatFields(lakeTypes: Map[String, String]): Seq[(String, Int)] =
    geoColsOf(lakeTypes).zipWithIndex.flatMap { case (c, ci) =>
      Suffixes.zipWithIndex.map { case (sfx, k) =>
        (metaName(c, sfx), StatIdBase + ci * 4 + k)
      }
    }

  /** WKB-encoded 2D point, little-endian — the spec's geometry bound
    * encoding (lower = (xmin, ymin), upper = (xmax, ymax)). */
  def wkbPoint(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    bb.array()
  }

  /** The bounding box of one WKB geometry: (xmin, ymin, xmax, ymax).
    * Supports 2D Point / LineString / Polygon / MultiPoint /
    * MultiLineString / MultiPolygon / GeometryCollection in either byte
    * order; an empty geometry (NaN point / zero elements) yields None.
    * Malformed bytes refuse loudly — silently recording wrong bounds
    * would corrupt pruning. */
  def bbox(wkb: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    val acc = new BboxAcc
    walk(ByteBuffer.wrap(wkb), acc)
    acc.result
  }

  private final class BboxAcc {
    var xmin: Double = Double.NaN
    var ymin: Double = Double.NaN
    var xmax: Double = Double.NaN
    var ymax: Double = Double.NaN
    def add(x: Double, y: Double): Unit = {
      if (x.isNaN || y.isNaN) return // empty-point convention
      if (xmin.isNaN || x < xmin) xmin = x
      if (xmax.isNaN || x > xmax) xmax = x
      if (ymin.isNaN || y < ymin) ymin = y
      if (ymax.isNaN || y > ymax) ymax = y
    }
    def result: Option[(Double, Double, Double, Double)] =
      if (xmin.isNaN) None else Some((xmin, ymin, xmax, ymax))
  }

  private def walk(bb: ByteBuffer, acc: BboxAcc): Unit = {
    val order = bb.get()
    bb.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val rawType = bb.getInt
    require((rawType & 0xE0000000) == 0 && rawType % 1000 <= 7,
      s"graft-iceberg: unsupported WKB geometry type $rawType " +
        "(2D Point/LineString/Polygon/Multi*/Collection only)")
    rawType match {
      case 1 => acc.add(bb.getDouble, bb.getDouble)
      case 2 => // linestring: numPoints then points
        val n = bb.getInt
        var i = 0
        while (i < n) { acc.add(bb.getDouble, bb.getDouble); i += 1 }
      case 3 => // polygon: numRings, each numPoints then points
        val rings = bb.getInt
        var r = 0
        while (r < rings) {
          val n = bb.getInt
          var i = 0
          while (i < n) { acc.add(bb.getDouble, bb.getDouble); i += 1 }
          r += 1
        }
      case 4 | 5 | 6 | 7 => // multi*/collection: numGeoms then nested WKB
        val n = bb.getInt
        var i = 0
        while (i < n) { walk(bb, acc); i += 1 }
      case other => sys.error(
        s"graft-iceberg: unsupported WKB geometry type $other")
    }
  }
}

package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geohash encoding (public algorithm: interleaved lon/lat bisection
  * bits, base32 alphabet) as a compiled kernel.
  *
  * Bit-parity with the DuckDB oracle: both sides compute the SAME
  * fixed-point construction — lon_int = floor((lon+180)/360 * 2^L),
  * lat_int = floor((lat+90)/180 * 2^(5p-L)) with L = ceil(5p/2), then
  * interleave MSB-first starting with longitude. Pure +,-,*,/ double
  * arithmetic in the same order on both engines => identical IEEE
  * results (no libm calls involved).
  */
object GeoKernels {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz".getBytes

  def geohashKernel(lat: Double, lon: Double, p: Int): UTF8String = {
    val nBits = 5 * p
    val lonBits = (nBits + 1) / 2
    val latBits = nBits / 2
    var lonI = math.floor((lon + 180.0) / 360.0 * (1L << lonBits)).toLong
    var latI = math.floor((lat + 90.0) / 180.0 * (1L << latBits)).toLong
    if (lonI >= (1L << lonBits)) lonI = (1L << lonBits) - 1
    if (latI >= (1L << latBits)) latI = (1L << latBits) - 1
    var v = 0L
    var k = 0
    while (k < nBits) {
      val bit =
        if ((k & 1) == 0) (lonI >> (lonBits - 1 - (k >> 1))) & 1L
        else (latI >> (latBits - 1 - (k >> 1))) & 1L
      v = v * 2 + bit
      k += 1
    }
    val out = new Array[Byte](p)
    var j = 0
    while (j < p) {
      out(j) = Base32(((v >> (5 * (p - 1 - j))) & 31L).toInt)
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Even-odd ray cast of a fixed query point against a PER-ROW polygon
  * (parallel lat/lon vertex arrays, open ring — the closing edge is
  * implicit). This is the indexed-shape side of `geo_shape`: every
  * document carries its own geometry, so the polygon test can't be
  * unrolled into literal column math the way a fixed QUERY polygon can
  * (Relational.geoPolygon); instead one compiled loop runs per row.
  * Handles convex and non-convex simple polygons alike.
  */
object PolyKernels {
  def containsPoint(
      lats: org.apache.spark.sql.catalyst.util.ArrayData,
      lons: org.apache.spark.sql.catalyst.util.ArrayData,
      py: Double, px: Double): Boolean = {
    val n = lats.numElements()
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val yi = lats.getDouble(i); val xi = lons.getDouble(i)
      val yj = lats.getDouble(j); val xj = lons.getDouble(j)
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Even-odd parity across a LIST of rings (array<array<double>>):
    * GeoJSON-style polygon-with-holes and multipolygon both reduce to
    * this one rule — a point inside an outer ring and inside one of
    * its holes crosses both boundaries (even parity = outside), and
    * disjoint multipolygon parts OR together because a point can lie
    * in at most one part. One compiled loop over rings per row. */
  def multiRingContainsPoint(
      latRings: org.apache.spark.sql.catalyst.util.ArrayData,
      lonRings: org.apache.spark.sql.catalyst.util.ArrayData,
      py: Double, px: Double): Boolean = {
    val nr = latRings.numElements()
    var inside = false
    var r = 0
    while (r < nr) {
      if (containsPoint(latRings.getArray(r), lonRings.getArray(r), py, px))
        inside = !inside
      r += 1
    }
    inside
  }

  /** Open linestring (vertex path, NOT closed) vs axis-aligned box:
    * true when any segment intersects the box — bbox reject, then the
    * separating-line test (all four box corners strictly on one side
    * of the segment's supporting line = no hit). The same closed-form
    * comparisons the DuckDB oracle mirrors (boolean output — no
    * rounding concerns). */
  def linestringIntersectsBox(
      lats: org.apache.spark.sql.catalyst.util.ArrayData,
      lons: org.apache.spark.sql.catalyst.util.ArrayData,
      top: Double, left: Double, bottom: Double, right: Double): Boolean = {
    val n = lats.numElements()
    var i = 0
    while (i < n - 1) {
      val y1 = lats.getDouble(i); val x1 = lons.getDouble(i)
      val y2 = lats.getDouble(i + 1); val x2 = lons.getDouble(i + 1)
      val bboxMiss =
        math.max(x1, x2) < left || math.min(x1, x2) > right ||
        math.max(y1, y2) < bottom || math.min(y1, y2) > top
      if (!bboxMiss) {
        def cross(cx: Double, cy: Double): Double =
          (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
        val d1 = cross(left, bottom); val d2 = cross(left, top)
        val d3 = cross(right, bottom); val d4 = cross(right, top)
        val sameSide = (d1 > 0 && d2 > 0 && d3 > 0 && d4 > 0) ||
          (d1 < 0 && d2 < 0 && d3 < 0 && d4 < 0)
        if (!sameSide) return true
      }
      i += 1
    }
    false
  }
}

/** (latArray, lonArray) -> does the row's linestring intersect the
  * query envelope? One compiled segment loop per row. */
case class LinestringIntersectsBox(
    left: Expression, right: Expression,
    top: Double, boxLeft: Double, bottom: Double, boxRight: Double)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "linestring_intersects_box"

  override def nullSafeEval(lats: Any, lons: Any): Any =
    PolyKernels.linestringIntersectsBox(
      lats.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      lons.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      top, boxLeft, bottom, boxRight)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo) =>
      s"${ev.value} = graft.expr.PolyKernels.linestringIntersectsBox(" +
        s"$la, $lo, $top, $boxLeft, $bottom, $boxRight);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LinestringIntersectsBox =
    copy(left = newLeft, right = newRight)
}

/** (array<array<double>> lat rings, same-shaped lon rings) -> even-odd
  * containment of a fixed query point across all rings. Covers
  * polygon-with-holes and multipolygon in one kernel. */
case class MultiRingContainsPoint(
    left: Expression, right: Expression, qLat: Double, qLon: Double)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(ArrayType(DoubleType)))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "multi_ring_contains_point"

  override def nullSafeEval(lats: Any, lons: Any): Any =
    PolyKernels.multiRingContainsPoint(
      lats.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      lons.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      qLat, qLon)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo) =>
      s"${ev.value} = graft.expr.PolyKernels.multiRingContainsPoint($la, $lo, $qLat, $qLon);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiRingContainsPoint =
    copy(left = newLeft, right = newRight)
}

/** (latArray, lonArray) -> does the row's polygon contain (qLat, qLon)? */
case class PolygonContainsPoint(
    left: Expression, right: Expression, qLat: Double, qLon: Double)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "polygon_contains_point"

  override def nullSafeEval(lats: Any, lons: Any): Any =
    PolyKernels.containsPoint(
      lats.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      lons.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      qLat, qLon)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo) =>
      s"${ev.value} = graft.expr.PolyKernels.containsPoint($la, $lo, $qLat, $qLon);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolygonContainsPoint =
    copy(left = newLeft, right = newRight)
}

/** (lat, lon) -> geohash string at `precision` characters. */
case class GeoHash(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(precision >= 1 && precision <= 12, "geohash precision in [1,12]")

  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(DoubleType, DoubleType)

  override def dataType: DataType = StringType
  override def prettyName: String = "geohash"

  override def nullSafeEval(lat: Any, lon: Any): Any =
    GeoKernels.geohashKernel(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo) =>
      s"${ev.value} = graft.expr.GeoKernels.geohashKernel($la, $lo, $precision);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeoHash =
    copy(left = newLeft, right = newRight)
}

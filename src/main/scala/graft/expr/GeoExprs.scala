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

package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object Num {
  /** Round half-away-from-zero applied to the BINARY double — the
    * semantics DuckDB (and C std::round) use. Spark's own `round()`
    * routes through BigDecimal.valueOf, i.e. the shortest decimal
    * STRING repr, so e.g. the double 0.57404999..9 ("0.57405") rounds
    * UP in Spark but DOWN everywhere that rounds the binary value.
    * Every user-facing float in graft goes through this so results are
    * reproducible across engines and partitionings (SURVEY.md §5).
    */
  def round(c: Column, scale: Int): Column = {
    val m = math.pow(10, scale)
    val r = floor(abs(c) * m + lit(0.5)) / m
    when(c < 0, -r).otherwise(r)
  }

  /** Deterministic uniform draw in [0,1): first 48 md5 bits of the key
    * scaled by 2^-48 — the portable substitute for rand() that both
    * engines reproduce bit-for-bit (oracle: hexFold / 2^48). Shared by
    * every sampling operator so the construction can't drift. */
  def uniformHash48(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("double") / lit(281474976710656.0)

  def r4(c: Column): Column = round(c, 4)
  def r3(c: Column): Column = round(c, 3)

  /** Scalar (driver-side) twin of `round` — identical half-away-from-
    * zero binary semantics, for operators that assemble their 1-row
    * result from collected scalars. */
  def roundDouble(v: Double, scale: Int): Double = {
    val m = math.pow(10, scale)
    val r = math.floor(math.abs(v) * m + 0.5) / m
    if (v < 0) -r else r
  }
}

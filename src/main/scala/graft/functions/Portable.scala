package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * Spark's `round()` rounds the *shortest decimal rendering* of a double
  * (BigDecimal HALF_UP on Double.toString), while DuckDB rounds the binary
  * value; 19570.814999...  renders as "19570.815" and Spark rounds it up
  * where DuckDB rounds down. For oracle-checkable outputs we instead use
  * floor(x*10^d + 0.5)/10^d — plain IEEE-754 ops that evaluate bit-for-bit
  * identically in any engine (for the non-negative values we emit).
  */
object Portable {

  /** Portable half-up rounding to `d` decimals (non-negative inputs). */
  def pround(c: Column, d: Int): Column = {
    val p = math.pow(10.0, d.toDouble)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** DuckDB-SQL fragment equivalent to [[pround]]. */
  def proundSql(expr: String, d: Int): String = {
    val p = math.pow(10.0, d.toDouble).toLong
    s"(floor(($expr) * $p + 0.5) / $p)"
  }
}

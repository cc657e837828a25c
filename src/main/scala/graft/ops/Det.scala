package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, sum}
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic double rounding.
  *
  * Spark's `round` rounds the SHORTEST DECIMAL REPR of a double
  * (via BigDecimal.valueOf, HALF_UP) while DuckDB rounds the binary
  * value — so a quotient whose shortest repr ends in "…5" (e.g.
  * 9508.845) rounds differently (Spark .85, DuckDB .84). For oracle
  * parity every rounded double instead uses
  *   floor(x * 10^n + 0.5) / 10^n
  * expressed IDENTICALLY in Spark and in the DuckDB SQL: the same
  * IEEE-754 multiply/add/floor/divide sequence is bit-deterministic
  * across engines. (Half values round toward +inf; the reference's R
  * half-to-even only matters for its own CSVs, covered by `bround`
  * in the parking pipeline.)
  */
object Det {
  private def pow10(n: Int): Double = math.pow(10, n)

  /** floor(c * 10^n + 0.5) / 10^n as a Column (double in, double out). */
  def r(c: Column, n: Int): Column = {
    val p = pow10(n)
    floor(c * p + 0.5) / p
  }

  def r1(c: Column): Column = r(c, 1)
  def r2(c: Column): Column = r(c, 2)
  def r4(c: Column): Column = r(c, 4)
  def r6(c: Column): Column = r(c, 6)

  /** The same rounding as a DuckDB SQL fragment. */
  def sql(e: String, n: Int): String = {
    val p = pow10(n).toLong
    s"floor(($e) * $p.0 + 0.5) / $p.0"
  }

  /** Cents-exact decimal view of a 2-decimal double column (TPC-H
    * money columns are exact multiples of 0.01, so the nearest-binary
    * double is never at a decimal-cast tie: Spark's HALF_UP-on-string
    * cast and DuckDB's binary-value cast produce the identical exact
    * decimal). decimal(12,2) leaves product headroom: a d2 × d2
    * product stays within both engines' 38-digit cap. */
  def d2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent EXACT sum of a cents-precision double column.
    * A double sum accumulates in engine-and-partitioning-specific
    * order; a ULP difference can cross a downstream rounding boundary
    * (the q1_sql_star_join round-1 failure). Decimal accumulation is
    * exact integer-cents arithmetic — associative, so partition count
    * and merge order cannot change the result. Emitted as double for
    * schema parity with the oracle. */
  def dsum2(c: Column): Column = sum(d2(c)).cast("double")

  /** DuckDB fragments of the same exact-decimal accumulation. */
  def sqlD2(e: String): String = s"cast($e AS decimal(12,2))"
  def sqlDsum2(e: String): String =
    s"cast(sum(cast($e AS decimal(12,2))) AS double)"
}

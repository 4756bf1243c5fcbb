package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric aggregation helpers.
  *
  * Summing doubles is order-dependent, so a Spark sum and a DuckDB sum of the
  * same column generally differ in the low bits — enough to fail a
  * hash-compare. The fix: cast each value to DECIMAL first (a deterministic
  * rounding of identical input bits on both engines), sum exactly in decimal
  * (order-independent), and cast the final value back to double (deterministic
  * nearest-double). Per-row double arithmetic (+,-,*,/) is IEEE-exact-rounded
  * and therefore already identical across engines; only aggregation order and
  * transcendental functions diverge.
  */
object Num {
  /** Exact SUM of a double expression via DECIMAL(18,4). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact SUM for expressions needing more fractional precision (e.g. a
    * transcendental per-row value): round to 6 decimals first, widening the
    * tie window far beyond any cross-engine 1-ulp divergence.
    */
  def dsum6(c: Column): Column =
    sum(round(c, 6).cast(DecimalType(28, 6))).cast("double")

  /** Exact AVG as exact-sum / count — double division is deterministic. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Raw money column (2 decimal places, stored as double) → exact decimal.
    * Safe because generated values sit ~1e-12 from the 2dp grid, so both
    * engines' double→decimal conversions agree; all downstream arithmetic
    * then happens exactly in decimal (never cast a *computed* double to
    * decimal — Spark converts via shortest-string, DuckDB via *10^s, and
    * values within 1 ulp of a grid boundary flip differently).
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Raw 0.xx rate column (discount/tax) → exact decimal. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal literal like 1.0 at scale 2. */
  def dlit(v: String): Column = lit(new java.math.BigDecimal(v))

  /** SQL-side twin of [[dsum]] for DuckDB oracle strings. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  def sqlDsum6(e: String): String =
    s"CAST(SUM(CAST(ROUND($e, 6) AS DECIMAL(28,6))) AS DOUBLE)"

  def sqlDavg(e: String): String = s"${sqlDsum(e)} / COUNT($e)"
}

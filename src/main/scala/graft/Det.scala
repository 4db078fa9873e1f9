package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers for the DuckDB-oracle gate (SURVEY.md §7.5.1).
  *
  * Floating-point SUM is order-dependent: Spark's partial/final aggregation
  * tree and DuckDB's sequential scan add doubles in different orders, so the
  * raw sums can differ in the last few ulps — enough to flip a ROUND(x, 4)
  * at a boundary. Instead every summed measure is quantized per-row to
  * DECIMAL(18,4) (rounding a double to 4 decimal places is engine-agnostic:
  * a binary double is never exactly on a .00005 tie), summed EXACTLY in
  * decimal (order-independent), and only then cast back to DOUBLE. Both
  * engines then hash identical bits.
  */
object Det {
  private val Dec = DecimalType(18, 4)

  /** Exact, order-independent sum of a double measure → DOUBLE. */
  def sumd(c: Column): Column =
    sum(c.cast(Dec)).cast(Dec).cast(DoubleType)

  /** Deterministic average built from the exact sum. */
  def avgd(c: Column): Column = sumd(c) / count(lit(1))

  /** DuckDB fragment equivalent to [[sumd]]. */
  def SUMD(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)"

  /** DuckDB fragment equivalent to [[avgd]]. */
  def AVGD(e: String): String = s"(${SUMD(e)} / COUNT(*))"

  /** Engine-agnostic 6-decimal rounding: floor(x·1e6 + 0.5)/1e6 is pure
    * IEEE double arithmetic, so both engines see identical bits. Spark's
    * `round()` instead rounds the double's SHORTEST DECIMAL REPR (HALF_UP)
    * while DuckDB rounds the raw binary — any dyadic value (terminating
    * binary fraction) whose decimal expansion ends exactly one digit past
    * the rounding point is a tie that the two engines resolve in opposite
    * directions (observed: a quality score of k/2^n at sf0.001). Use this
    * for every RATIONAL similarity/score; engine `round` stays safe only
    * for irrational-ish values (logs, square roots). */
  def round6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** DuckDB fragment equivalent to [[round6]]. */
  def ROUND6(e: String): String =
    s"(floor(($e) * 1000000.0 + 0.5) / 1000000.0)"
}

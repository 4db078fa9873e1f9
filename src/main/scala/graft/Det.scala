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
}

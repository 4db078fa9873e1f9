package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One §2 operator family = one module. `queries` feeds the driver's
  * verify/bench harness; `oracles` the DuckDB t2 gate (keys must be a
  * subset of `queries` — non-SQL-expressible operators omit theirs). */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}

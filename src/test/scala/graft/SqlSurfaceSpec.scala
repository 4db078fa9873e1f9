package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-text surface: for every declared query whose oracle SQL is
  * engine-portable (ANSI subset — no DuckDB list ops / `//` / epoch_us),
  * `spark.sql(oracleSql)` over the registered table views must produce
  * EXACTLY the declared DataFrame result. This proves a `spark.sql(...)`
  * user gets the same answers as the DataFrame API user — the "run your
  * SQL unchanged" half of the library's contract — and pins that the
  * oracle statements mean the same thing to a THIRD interpreter (Spark's
  * own parser) as to DuckDB. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  // portable-ANSI oracle statements (verified parseable by Spark's
  // parser; the rest use DuckDB-only constructs by design). q_unpivot /
  // q_histogram are excluded for a literal-TYPING dialect artifact, not
  // a value drift: Spark's SQL parser types `1000000.0` as DECIMAL(8,1)
  // (so the round6/bucket arithmetic stays decimal end-to-end) while the
  // DataFrame `lit` is DOUBLE — identical numbers, different cell types
  // under toString.
  private val portable = Seq(
    "q_agg_hash", "q_agg_distinct", "q_join_inner_fk", "q_join_left",
    "q_join_semi", "q_join_anti", "q_union", "q_union_distinct",
    "q_intersect", "q_except", "q_sort_limit", "q_window_rank",
    "q_topk_per_group", "q_agg_mode", "q_agg_bits",
    "q_scan_project", "q_project", "q_filter_or_eq")

  test("portable oracle SQL runs on spark.sql and matches the DataFrame result") {
    graft.sources.Tables.registerAll(spark, dir)
    val failures = portable.flatMap { name =>
      try {
        val viaSql = spark.sql(SparkEntry.oracleSql(name))
        val viaDf = SparkEntry.queries(name)(spark, dir)
        val l = viaSql.collect().map(_.toString)
        val r = viaDf.collect().map(_.toString)
        if (l.toSeq == r.toSeq) None
        else Some(s"$name: ${l.length} vs ${r.length} rows or value drift")
      } catch {
        case e: Exception => Some(s"$name: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} portable statements diverged:\n${failures.mkString("\n")}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DECLARED q_dsv2_agg_meta rides the metadata-only scan — pinned
  * here so a future edit that silently un-pushes it (a new filter, a
  * sum, a grouped variant) shows up as a plan drift, not a latent
  * full-scan at 100 TB. */
class MetadataAggPlanCheck extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("q_dsv2_agg_meta plans as DirSinkAggScan (metadata-only)") {
    val df = SparkEntry.queries("q_dsv2_agg_meta")(spark, TestSession.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("metadata-only"),
      s"expected the pushed aggregate scan, got:\n$plan")
    assert(df.count() == 1)
  }

  test("q_dsv2_agg_nulls rides the metadata scan — count(col) answered from null counts") {
    val df = SparkEntry.queries("q_dsv2_agg_nulls")(spark, TestSession.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("metadata-only"),
      s"expected the pushed aggregate scan (nullable count must not " +
        s"force a fallback scan), got:\n$plan")
    assert(df.count() == 1)
  }
}

package graft

import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partition pruning evidence (SURVEY.md §4.1): a date-partitioned events
  * layout must (a) round-trip values and (b) show PartitionFilters — not
  * data filters — in the scan for a partition-key predicate. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("partitioned write prunes partitions on read") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_part").toString
    val events = Tables.load(spark, TestSession.sfDir, "events")
      .withColumn("day", to_date($"ts"))
    Sinks.writePartitioned(events, out, Seq("day"))
    val back = spark.read.parquet(out)
    val oneDay = back.filter($"day" === lit(java.sql.Date.valueOf("2024-01-03")))
    // physical plan: predicate must land in PartitionFilters, and the
    // partition count read must be 1 directory's worth
    val plan = oneDay.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), plan.take(500))
    val expected = events.filter(to_date($"ts") === "2024-01-03").count()
    assert(oneDay.count() == expected && expected > 0)
    // pruned scan reads strictly fewer files than the full scan
    val scanned = oneDay.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.size).sum
      }.sum
    val total = back.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
      }.sum
    assert(scanned < total, s"pruned=$scanned total=$total")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 contract (sources.v2.DocGenSource): filters genuinely
  * narrow the SCAN (not just post-filter), projection prunes the reader
  * schema, the range splits into the requested partitions, and the
  * produced rows equal a reference derivation. */
class Dsv2Spec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def read(rows: Int = 1000, slices: Int = 8): DataFrame =
    spark.read.format("graft.sources.v2.DocGenSource")
      .option("rows", rows).option("slices", slices).load()

  private def scanOf(df: DataFrame): graft.sources.v2.DocGenScan = {
    // queries with an exchange wrap in AdaptiveSparkPlanExec, whose
    // inputPlan is not among its children — unwrap before collecting
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[graft.sources.v2.DocGenScan]
    }.get
  }

  test("full read: rows, partitions, and values match the reference derivation") {
    import spark.implicits._
    val df = read()
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 8)
    val got = df.as[(Long, String, Long)].collect().sortBy(_._1)
    val want = (0L until 1000L).map(i =>
      (i, graft.sources.v2.DocGen.lang(i), graft.sources.v2.DocGen.nChars(i)))
    assert(got.toSeq == want)
  }

  test("doc_id range predicates push into the scan and shrink the generated range") {
    import spark.implicits._
    val df = read().filter($"doc_id" >= 900L && $"doc_id" < 950L)
    val scan = scanOf(df)
    assert(scan.lo == 900L && scan.hi == 950L,
      s"range must narrow before generation, got [${scan.lo},${scan.hi})")
    assert(scan.description().contains("PushedFilters: ["))
    assert(df.count() == 50)
    // residual (non-id) filters still evaluate correctly on top
    val mixed = read().filter($"doc_id" >= 990L && $"lang" === "en")
    assert(scanOf(mixed).lo == 990L)
    assert(mixed.count() == 2) // ids 991, 996 are lang=en (id%5==1)
  }

  test("projection prunes the reader schema") {
    import spark.implicits._
    val df = read().select($"lang")
    assert(scanOf(df).readSchema().fieldNames.toSeq == Seq("lang"))
    assert(df.distinct().count() == 5)
  }

  test("equality predicate collapses to a single-row range and empty ranges plan no partitions") {
    import spark.implicits._
    val one = read().filter($"doc_id" === 123L)
    assert(scanOf(one).lo == 123L && scanOf(one).hi == 124L)
    assert(one.as[(Long, String, Long)].head() ==
      ((123L, graft.sources.v2.DocGen.lang(123), graft.sources.v2.DocGen.nChars(123))))
    val none = read().filter($"doc_id" > 2000L)
    assert(none.rdd.getNumPartitions == 0 || none.count() == 0)
  }

  test("q_dsv2_scan (declared): id range pushed, lang pruned from the reader") {
    val df = SparkEntry.queries("q_dsv2_scan")(spark, TestSession.sfDir)
    val scan = scanOf(df)
    assert(scan.lo == 100L && scan.hi == 4000L,
      s"pushed range expected [100,4000), got [${scan.lo},${scan.hi})")
    assert(scan.readSchema().fieldNames.toSeq == Seq("doc_id", "n_chars"),
      "lang must be pruned from the reader schema")
  }
}

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

  private def scanDesc(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collectFirst { case b: BatchScanExec => b.scan.description() }.get
  }

  test("limit pushes into the scan and narrows the generated range") {
    import spark.implicits._
    val df = read().filter($"doc_id" >= 100L).limit(7)
    assert(scanDesc(df).contains("PushedLimit"))
    assert(scanDesc(df).contains("range=[100,107)"))
    assert(df.as[(Long, String, Long)].collect().map(_._1).sorted.toSeq ==
      (100L to 106L))
  }

  test("grouped aggregates push COMPLETELY: no Spark-side aggregate, closed form == row-by-row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def aggOf(df: DataFrame) = df
      .filter($"doc_id" >= 10L)
      .groupBy($"lang")
      .agg(count($"doc_id").as("n"), min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"), sum($"doc_id").as("sum_id"),
        min($"n_chars").as("min_c"), max($"n_chars").as("max_c"),
        sum($"n_chars").as("sum_c"))
      .orderBy($"lang")
    val pushed = aggOf(read(rows = 997))
    assert(scanDesc(pushed).contains("PushedAggregation"),
      scanDesc(pushed))
    assert(!pushed.queryExecution.executedPlan.toString
      .contains("HashAggregate"),
      "complete pushdown must leave no Spark-side aggregate")
    // the closed-form cells must equal a brute-force derivation
    val brute = (10L until 997L)
      .map(i => (graft.sources.v2.DocGen.lang(i), i,
        graft.sources.v2.DocGen.nChars(i)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (l, rs) =>
        (l, rs.size.toLong, rs.map(_._2).min, rs.map(_._2).max,
          rs.map(_._2).sum, rs.map(_._3).min, rs.map(_._3).max,
          rs.map(_._3).sum) }
    val got = pushed
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == brute)
    // ...and the whole point: a trillion virtual rows aggregate without
    // materializing one (count per class = 2e11 exactly: 1e12 % 5 == 0)
    val trillion = spark.read.format("graft.sources.v2.DocGenSource")
      .option("rows", 1000000000000L).option("slices", 8).load()
      .groupBy($"lang").agg(count($"doc_id").as("n"))
      .orderBy($"lang")
    assert(trillion.as[(String, Long)].collect().toSeq ==
      Seq("de", "en", "es", "fr", "zh").map((_, 200000000000L)))
  }

  test("global (ungrouped) aggregate pushes; empty range yields count 0 with null min/max") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = read(rows = 997)
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("s"),
        min($"n_chars").as("mn"), max($"n_chars").as("mx"))
    assert(scanDesc(df).contains("PushedAggregation"))
    val want = (0L until 997L).map(graft.sources.v2.DocGen.nChars)
    assert(df.as[(Long, Long, Long, Long)].head() ==
      ((997L, want.sum, want.min, want.max)))
    val empty = read(rows = 100).filter($"doc_id" >= 100L)
      .agg(count(lit(1)).as("n"), min($"doc_id").as("mn"))
    val row = empty.collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("runtime filtering: a dim-driven join narrows the generated ids at execution (DSv2 DPP)") {
    import spark.implicits._
    // the dim's surviving keys are knowable only at runtime, so nothing
    // constant-folds; the scan must receive them as an In runtime filter
    // (broadcast reuse) and plan ONLY those ids — 5 of 100000
    val fact = read(rows = 100000, slices = 8)
    val dim = spark.range(0, 25).toDF("k")
      .filter($"k" % 5 === 2)
    val joined = fact.join(dim, fact("doc_id") === dim("k"))
      .select($"doc_id", $"lang", $"n_chars")
    val rows = joined.collect().sortBy(_.getLong(0))
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 7L, 12L, 17L, 22L))
    assert(rows.forall(r => r.getString(1) ==
      graft.sources.v2.DocGen.lang(r.getLong(0))))
    val scan = scanOf(joined)
    assert(scan.runtimeNarrowedTo.contains(5),
      s"scan must generate only the 5 runtime-filtered ids, " +
        s"got narrowing=${scan.runtimeNarrowedTo}")
    // the runtime filter must be visible in the plan as dynamic pruning
    assert(joined.queryExecution.executedPlan.toString
      .contains("dynamicpruning"),
      "join must plan a DynamicPruning runtime filter on the v2 scan")
  }

  test("q_dsv2_runtime_filter (declared): parquet-dim keys narrow the scan at runtime") {
    val df = SparkEntry.queries("q_dsv2_runtime_filter")(spark, TestSession.sfDir)
    // collect THIS df: count() would execute a separate plan with its
    // own scan instance, leaving this one's runtime filter unapplied
    val n = df.collect().length
    assert(n > 0)
    val scan = scanOf(df)
    assert(scan.runtimeNarrowedTo.contains(n),
      s"scan must narrow to exactly the ${n} surviving dim keys, " +
        s"got ${scan.runtimeNarrowedTo}")
  }

  test("reported statistics drive join planning: a small generated slice auto-broadcasts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.count
    // without SupportsReportStatistics Spark treats a V2 relation as
    // infinitely large and sort-merges; with the closed-form row count
    // the 25-row slice must broadcast against the parquet fact
    val dim = read(rows = 5000).filter($"doc_id" < 25L)
    val fact = graft.sources.Tables.load(spark, TestSession.sfDir, "events")
    val joined = fact.join(dim, fact("user_id") === dim("doc_id"))
      .groupBy($"lang").agg(count($"event_id").as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"25-row stats-reported dim must broadcast, plan:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum > 0)
    // and the stats themselves are the post-pushdown closed form
    val scan = scanOf(dim)
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 25L)
  }

  test("limit over a pushed aggregate limits OUTPUT rows, never the aggregate's input range") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Spark pushes the limit AFTER the aggregation on the same builder;
    // the source must decline it (JDBC-connector semantics) or the
    // completely-pushed counts would be computed over only `limit` rows
    val limited = read(rows = 1000).groupBy($"lang")
      .agg(count(lit(1)).as("n")).limit(3)
    assert(scanDesc(limited).contains("PushedAggregation"))
    assert(!scanDesc(limited).contains("PushedLimit"),
      "a limit over an aggregate must not narrow the generated range")
    val got = limited.as[(String, Long)].collect()
    assert(got.length == 3)
    assert(got.forall(_._2 == 200L), // 1000 rows / 5 langs, full range
      s"group counts must cover the FULL input range, got ${got.toSeq}")
  }

  test("sum pushdown refuses when the closed-form series would overflow Long") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4e9 ids: sum = n(n-1)/2 ≈ 8.0e18 < Long.Max — pushes, exact value
    val n = 4000000000L
    val ok = spark.read.format("graft.sources.v2.DocGenSource")
      .option("rows", n).option("slices", 4).load()
      .agg(sum($"doc_id").as("s"))
    assert(scanDesc(ok).contains("PushedAggregation"))
    assert(ok.as[Long].head() ==
      (BigInt(n) * (n - 1) / 2).toLong)
    // 1e12 ids: sum ≈ 5e23 wraps Long — the source must refuse the
    // pushdown (plan keeps Spark's own aggregate over the raw scan) so
    // Spark's ANSI overflow semantics apply instead of silent garbage
    val over = spark.read.format("graft.sources.v2.DocGenSource")
      .option("rows", 1000000000000L).option("slices", 8).load()
      .agg(sum($"doc_id").as("s"))
    assert(!scanDesc(over).contains("PushedAggregation"),
      "an overflowing sum must not push down")
    assert(over.queryExecution.executedPlan.toString.contains("HashAggregate"))
    // count over the same trillion rows still pushes (count never wraps)
    val cnt = spark.read.format("graft.sources.v2.DocGenSource")
      .option("rows", 1000000000000L).option("slices", 8).load()
      .agg(count(lit(1)).as("n"))
    assert(scanDesc(cnt).contains("PushedAggregation"))
    assert(cnt.as[Long].head() == 1000000000000L)
  }

  test("avg pushes via Spark's sum/count decomposition; countDistinct falls back, still correct") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val brute = (0L until 997L)
      .map(i => (graft.sources.v2.DocGen.lang(i),
        graft.sources.v2.DocGen.nChars(i)))
      .groupBy(_._1).toSeq.sortBy(_._1)
    // avg: Spark rewrites to sum/count, both of which this source
    // pushes, so even avg aggregates store-side
    val av = read(rows = 997).groupBy($"lang")
      .agg(avg($"n_chars").as("a")).orderBy($"lang")
    assert(scanDesc(av).contains("sum(n_chars)") &&
      scanDesc(av).contains("count(n_chars)"), scanDesc(av))
    av.as[(String, Double)].collect().toSeq.zip(brute).foreach {
      case ((gl, ga), (bl, rs)) =>
        assert(gl == bl &&
          math.abs(ga - rs.map(_._2).sum.toDouble / rs.size) < 1e-9) }
    // count(DISTINCT …): not translatable → the whole aggregation
    // falls back to a Spark-side aggregate over the raw scan
    val cd = read(rows = 997).groupBy($"lang")
      .agg(countDistinct($"n_chars").as("d")).orderBy($"lang")
    assert(!scanDesc(cd).contains("PushedAggregation"))
    assert(cd.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(cd.as[(String, Long)].collect().toSeq ==
      brute.map { case (l, rs) => (l, rs.map(_._2).distinct.size.toLong) })
  }
}

package graft

import graft.sources.v2.{DirSink, DirSinkScan, DirSinkSource}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `OPTIMIZE … ZORDER BY (a, b)` on DirSink zones: the compaction
  * clusters on the Morton interleave of the dimensions, so every
  * output file covers a tight rectangle in BOTH — per-file min/max
  * stats then skip on predicates over EITHER dimension, where a 1-D
  * sort only ever serves its leading column. The assertion is the
  * skipping property itself (planned-file counts), not the layout's
  * internals. */
class ZoneZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val fmt = classOf[DirSinkSource].getName

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_zorder").toString

  private def plannedFiles(df: DataFrame): Int = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collectFirst { case b: BatchScanExec =>
      b.scan.asInstanceOf[DirSinkScan] }.get.planInputPartitions().length
  }

  /** A full 100×100 grid — x and y genuinely independent (every pair
    * occurs exactly once), row order scrambled: the worst case for any
    * single sort. (A pair of modular hashes of the SAME id would be
    * correlated — each x value implying one y value — and a 1-D sort
    * would accidentally skip the other dim.) */
  private def writeGrid(dir: String): Unit = {
    import spark.implicits._
    spark.range(10000)
      .select(($"id" % 100L).as("x"),
        ($"id" / 100L).cast("long").as("y"),
        $"id".as("payload"))
      .repartition(4)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
  }

  test("ZORDER BY (x, y): both dimensions skip; 1-D clustering only serves its own column") {
    import spark.implicits._
    val zdir = tmpDir()
    writeGrid(zdir)
    val cat = s"zcat_${math.abs(zdir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      new java.io.File(zdir).getParent)
    val tbl = s"$cat.`${new java.io.File(zdir).getName}`"
    val res = spark.sql(s"OPTIMIZE $tbl ZORDER BY (x, y) TARGET 16 FILES")
      .collect()
    assert(res.head.getLong(1) == 16 && res.head.getLong(2) == 10000)

    def read() = spark.read.format(fmt).option("path", zdir).load()
    assert(read().count() == 10000)
    val total = DirSink.readManifest(zdir).get._2.size
    // a narrow band in EITHER dimension must skip most files — the
    // z-layout's defining property; 16 files tile a ~4×4 grid, so a
    // 10-wide band (1/10 of one axis) crosses at most one tile row
    // plus boundary spill
    val xPlan = plannedFiles(read().filter($"x" < 10))
    val yPlan = plannedFiles(read().filter($"y" < 10))
    assert(xPlan <= total / 2,
      s"x-band must skip on a z-layout: $xPlan of $total")
    assert(yPlan <= total / 2,
      s"y-band must skip on a z-layout: $yPlan of $total")
    // and a box predicate (both dims) prunes harder than either band
    val boxPlan = plannedFiles(read().filter($"x" < 10 && $"y" < 10))
    assert(boxPlan <= math.min(xPlan, yPlan))
    assert(read().filter($"x" < 10 && $"y" < 10).count() == 100,
      "the 10x10 corner of the grid holds exactly 100 cells")

    // CONTRAST: the same data 1-D clustered on x skips x-bands but
    // reads everything for a y-band — the gap z-order exists to close
    val cdir = tmpDir()
    writeGrid(cdir)
    DirSink.compact(spark, cdir, targetFiles = 16, clusterBy = Seq("x"))
    def readC() = spark.read.format(fmt).option("path", cdir).load()
    // range-partitioning 100 distinct x values into 16 files can leave
    // some files EMPTY (their `e` stats marker skips under any filter)
    // — the y-band comparison is over the files that hold rows
    val cNonEmpty = DirSink.readManifestEntries(cdir).get._2
      .count(_.rows > 0)
    assert(plannedFiles(readC().filter($"x" < 10)) <= cNonEmpty / 2)
    assert(plannedFiles(readC().filter($"y" < 10)) == cNonEmpty,
      "a 1-D x-sort cannot skip a y-band — every non-empty file spans y")
  }

  test("guards: one column refuses, unsupported dim type refuses, row preservation asserted") {
    import spark.implicits._
    val dir = tmpDir()
    spark.range(100).select($"id".as("x"), concat(lit("s"), $"id").as("s"))
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    assert(intercept[IllegalArgumentException] {
      DirSink.compact(spark, dir, 2, zorderBy = Seq("x"))
    }.getMessage.contains("2 or 3"))
    assert(intercept[IllegalArgumentException] {
      DirSink.compact(spark, dir, 2, zorderBy = Seq("x", "s"))
    }.getMessage.contains("numeric, date, and timestamp"))
    assert(intercept[IllegalArgumentException] {
      DirSink.compact(spark, dir, 2, clusterBy = Seq("x"),
        zorderBy = Seq("x", "x"))
    }.getMessage.contains("not both"))
  }
}

package graft

import graft.sources.v2.{DirSink, DirSinkScan}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-ORDER × DATA SKIPPING — the two layout levers composed, through
  * the engine's own table format: clustering a zone by the MORTON
  * z-value of (x, y) makes each committed file cover a compact
  * rectangle-ish region of the plane, so its per-file min/max stats are
  * tight on BOTH columns at once and a 2-D range predicate prunes files
  * on either dimension (the Delta `OPTIMIZE … ZORDER BY` payoff,
  * exercised end to end: write → compact(clusterBy z) → stats → skip).
  * Single-column clustering can only ever serve one dimension — the
  * control case pins that contrast. */
class ZorderSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val fmt = "graft.sources.v2.DirSinkSource"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_zskip").toString

  private def plannedFiles(df: DataFrame): Int = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collectFirst { case b: BatchScanExec =>
      b.scan.asInstanceOf[DirSinkScan]
    }.get.planInputPartitions().length
  }

  private def read(dir: String): DataFrame =
    spark.read.format(fmt).option("path", dir).load()

  /** A 64×64 grid, written row-major (x-clustered): y spans the whole
    * range in every x-stripe. */
  private def grid(): DataFrame = {
    import spark.implicits._
    spark.range(64L * 64L)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
  }

  test("z-clustered files prune on BOTH dimensions; one-dimensional clustering cannot") {
    import spark.implicits._
    val zdir = tmpDir()
    val xdir = tmpDir()
    val withZ = grid()
      .withColumn("z", expr(graft.operators.Layouts.mortonExpr("x", "y", "div")))
    withZ.write.format(fmt).option("path", zdir)
      .mode(SaveMode.Overwrite).save()
    DirSink.compact(spark, zdir, targetFiles = 16, clusterBy = Seq("z"))
    // control: same data clustered on x alone
    withZ.write.format(fmt).option("path", xdir)
      .mode(SaveMode.Overwrite).save()
    DirSink.compact(spark, xdir, targetFiles = 16, clusterBy = Seq("x"))

    val xq = col("x") >= 8 && col("x") < 16
    val yq = col("y") >= 8 && col("y") < 16

    // x-range: both layouts prune (x-clustered trivially; z-clustered
    // because z-contiguous files cover compact x spans)
    val zx = plannedFiles(read(zdir).filter(xq))
    val xx = plannedFiles(read(xdir).filter(xq))
    assert(zx < 16 && xx < 16, s"x-range must prune on both: z=$zx x=$xx")

    // y-range: ONLY the z-layout prunes — every x-stripe file spans all
    // of y, so the 1-D layout reads everything
    val zy = plannedFiles(read(zdir).filter(yq))
    val xy = plannedFiles(read(xdir).filter(yq))
    assert(zy < 16, s"z-layout must prune a y-range, planned $zy/16")
    assert(xy == 16, s"x-layout cannot prune a y-range, planned $xy/16")

    // the 2-D box composes: z-layout prunes deeper than either axis
    val zbox = plannedFiles(read(zdir).filter(xq && yq))
    assert(zbox <= zx && zbox <= zy && zbox <= 4,
      s"2-D box on the z-layout must compound the pruning, planned $zbox")

    // and correctness is untouched: the box returns exactly the 8×8 grid
    val n = read(zdir).filter(xq && yq).count()
    assert(n == 64)
    assert(read(xdir).filter(xq && yq).count() == 64)
  }
}

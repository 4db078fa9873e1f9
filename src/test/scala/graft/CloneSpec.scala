package graft

import graft.sources.v2.{DirSink, DirSinkScan}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SHALLOW CLONE (round 15 — Delta's zero-copy clone): the target's
  * gen-0 snapshot references the source's files by absolute path. The
  * laws:
  *
  *   - zero data copied: the clone's directory holds NO data files at
  *     clone time, yet reads return the source's rows exactly;
  *   - independence from the snapshot on: appends/DELETE on either
  *     side never change the other's answers;
  *   - everything carries: schema, format, column mapping, stats
  *     (file skipping works on the clone), CHECK constraints;
  *   - OPTIMIZE re-materializes: after a compaction the clone owns
  *     local files and survives the source's vacuum;
  *   - the documented caveat is REAL: vacuum on the source after a
  *     source rewrite can break the clone (same as Delta) — pinned
  *     here so the doc never drifts from the behavior;
  *   - the SQL form allocates the target through the catalog layout
  *     rule and the new table is immediately loadable. */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    if (s.conf.getOption("spark.sql.catalog.graftcat").isEmpty) {
      s.conf.set("spark.sql.catalog.graftcat",
        "graft.sources.v2.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftcat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    }
    s
  }
  private val fmt = "graft.sources.v2.DirSinkSource"

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(col("id"), (col("id") * 7).as("v"))
      .coalesce(1).write.format(fmt).option("path", dir)
      .mode(SaveMode.Append).save()

  private def load(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private def scanOf(df: DataFrame): DirSinkScan = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[DirSinkScan]
    }.get
  }

  private def dataFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq.map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))

  test("zero-copy: no data files in the clone dir, answers equal the source") {
    val src = tmp("graft_clsrc"); val dst = tmp("graft_cldst")
    append(src, 0, 10); append(src, 10, 25)
    val srcGen = DirSink.cloneZone(src, dst)
    assert(srcGen == 1L)
    assert(dataFiles(dst).isEmpty, s"clone must copy nothing: " +
      s"${dataFiles(dst)}")
    assert(load(dst).count() == 25 &&
      load(dst).agg(sum("id")).head.getLong(0) == (0L until 25).sum)
    // cloning onto an existing zone refuses
    intercept[IllegalStateException] { DirSink.cloneZone(src, dst) }
  }

  test("independence: writes on either side never reach the other") {
    val src = tmp("graft_clsrc"); val dst = tmp("graft_cldst")
    append(src, 0, 10)
    DirSink.cloneZone(src, dst)
    append(dst, 100, 110) // clone gains rows
    append(src, 200, 230) // source gains different rows
    assert(load(dst).count() == 20 && load(src).count() == 40)
    assert(load(dst).filter(col("id") >= 200).count() == 0,
      "the source's post-clone append must not leak into the clone")
    assert(load(src).filter(col("id") >= 100 && col("id") < 110).count()
      == 0, "the clone's append must not leak into the source")
    // a DELETE on the source (CoW rewrite) leaves the clone intact:
    // the rewritten-away files stay on disk until the source vacuums
    new graft.sources.v2.DirSinkTable(src,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"))
      .deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.LessThan("id", 5L)))
    assert(load(src).count() == 35 && load(dst).count() == 20,
      "CoW on the source must not change the clone's answer")
  }

  test("stats carry: file skipping plans fewer files on the clone") {
    val src = tmp("graft_clsrc"); val dst = tmp("graft_cldst")
    (0 until 4).foreach(k => append(src, k * 100L, k * 100L + 100L))
    DirSink.cloneZone(src, dst)
    val sliced = load(dst).filter(col("id") >= 350)
    // collect() executes THIS DataFrame's plan — the scan instance
    // scanOf inspects (count() would plan a separate query)
    assert(sliced.collect().length == 50)
    // the skipped plan reads 1 of the 4 referenced files
    assert(scanOf(sliced).lastPlannedFiles.contains(1),
      s"bounds must skip 3 of 4 absolute entries; " +
        s"planned=${scanOf(sliced).lastPlannedFiles}")
  }

  test("OPTIMIZE re-materializes; the source-vacuum caveat is real before it, gone after") {
    val src = tmp("graft_clsrc"); val dst = tmp("graft_cldst")
    append(src, 0, 10); append(src, 10, 20)
    DirSink.cloneZone(src, dst)
    // source rewrite (compact to 1 file) strands the clone's entries
    // in the source dir, protected only by source retention
    DirSink.compact(spark, src, 1)
    assert(load(dst).count() == 20, "pre-vacuum: the old files remain")
    val referenced = DirSink.readManifest(dst).get._2
      .map(e => new org.apache.hadoop.fs.Path(e._1).getName).toSet
    val sweptDry = DirSink.vacuum(src, 0L, dryRun = true)
    assert(referenced.exists(sweptDry.contains),
      s"the source vacuum WOULD sweep files the clone references " +
        s"(the documented caveat): referenced=$referenced " +
        s"sweep=$sweptDry")
    // re-materialize the clone, THEN vacuum the source for real
    DirSink.compact(spark, dst, 1)
    assert(dataFiles(dst).nonEmpty, "OPTIMIZE output is local")
    DirSink.vacuum(src, 0L)
    assert(load(dst).count() == 20 &&
      load(dst).agg(sum("id")).head.getLong(0) == (0L until 20).sum,
      "a re-materialized clone survives the source's vacuum")
    assert(load(src).count() == 20)
  }

  test("SQL form: CREATE TABLE t2 SHALLOW CLONE t1 through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.clsql")
    spark.sql("CREATE TABLE graftcat.clsql.t1 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graftcat.clsql.t1 VALUES (1, 'a'), (2, 'b')")
    val r = spark.sql(
      "CREATE TABLE graftcat.clsql.t2 SHALLOW CLONE graftcat.clsql.t1")
      .head
    assert(r.getLong(1) >= 1L, s"cloned files reported: $r")
    assert(spark.sql("SELECT * FROM graftcat.clsql.t2").count() == 2)
    spark.sql("INSERT INTO graftcat.clsql.t2 VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM graftcat.clsql.t1")
      .head.getLong(0) == 2, "the clone's INSERT stays its own")
    // provenance surfaces in the clone's history
    val hist = spark.sql(
      "SELECT operation FROM graftcat.clsql.`t2$history` ORDER BY version")
      .collect().map(_.getString(0))
    assert(hist.head == "clone", hist.mkString(","))
  }

  test("a cloned zone declares the absolute-paths reader feature") {
    val src = tmp("graft_clsrc"); val dst = tmp("graft_cldst")
    append(src, 0, 5)
    DirSink.cloneZone(src, dst)
    val seg = new java.io.File(dst, "_graft_log").listFiles()
      .filter(_.getName.endsWith(".commit")).maxBy(_.getName)
    val txt = java.nio.file.Files.readString(seg.toPath)
    assert(txt.contains("absolute-paths"), txt)
    assert(txt.contains("#clonesrc="), txt)
  }
}

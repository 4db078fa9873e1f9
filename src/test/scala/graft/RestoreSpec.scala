package graft

import graft.sources.v2.DirSink
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `RESTORE TABLE … TO VERSION AS OF g` (Delta's RESTORE, round 15) —
  * the write-side consumer of the retained commit log: one snapshot
  * commit makes era g the head again. The laws:
  *
  *   - data AND schema travel back (a restore past an ADD COLUMN
  *     drops the tail; past a RENAME, the old names return via the
  *     era's column mapping — values intact);
  *   - nothing is copied: the restored generation's file list is the
  *     era's verbatim (names equal), an O(metadata) publish;
  *   - the generation counter only moves forward, and the UNDONE
  *     generations stay time-travelable behind the restore;
  *   - the streaming `#emax` high-water never regresses (a replayed
  *     epoch stays replayed across a restore);
  *   - restoring to the head is a no-op; a vacuumed-away generation
  *     refuses loudly;
  *   - the SQL form returns (restored_version, new_generation, files)
  *     and TIMESTAMP AS OF resolves like time travel. */
class RestoreSpec extends AnyFunSuite {
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

  private def append(dir: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(col("id"), (col("id") * 7).as("v"))
      .coalesce(1).write.format(fmt).option("path", dir)
      .mode(SaveMode.Append).save()

  private def load(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  test("restore undoes a DELETE: data, file list, and history shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rst").toString
    append(dir, 0, 10)  // gen 0
    append(dir, 10, 20) // gen 1
    val pre = DirSink.currentGen(dir).get
    val preNames = DirSink.readManifest(dir).get._2.map(_._1)
    new graft.sources.v2.DirSinkTable(dir,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT"))
      .deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.LessThan("id", 5L))) // gen 2
    assert(load(dir).count() == 15)
    val newGen = DirSink.restore(dir, pre)
    assert(newGen == pre + 2, "the counter moves FORWARD")
    assert(load(dir).count() == 20 &&
      load(dir).agg(sum("id")).head.getLong(0) == (0L until 20).sum,
      "the era's rows are the head again")
    assert(DirSink.readManifest(dir).get._2.map(_._1) == preNames,
      "restore is metadata-only: the era's files verbatim, no copies")
    // the undone DELETE generation is still reachable behind it
    assert(spark.read.format(fmt).option("path", dir)
      .option("asOfVersion", pre + 1).load().count() == 15)
    // restoring to the current head is a no-op
    assert(DirSink.restore(dir, newGen) == newGen)
    assert(DirSink.history(dir).last.op.startsWith("restore"))
  }

  test("schema travels back: restore past ADD COLUMN and RENAME") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rsts").toString
    append(dir, 0, 10)
    val pre = DirSink.currentGen(dir).get
    DirSink.evolveSchema(dir, org.apache.spark.sql.types.StructType
      .fromDDL("id BIGINT, v BIGINT, extra STRING"))
    DirSink.renameColumn(dir, "v", "weight")
    assert(load(dir).columns.toSeq == Seq("id", "weight", "extra"))
    DirSink.restore(dir, pre)
    val back = load(dir)
    assert(back.columns.toSeq == Seq("id", "v"),
      s"the era's schema (and colmap) must be the head's: ${back.columns.toSeq}")
    assert(back.agg(sum("v")).head.getLong(0) ==
      (0L until 10L).map(_ * 7).sum, "values resolve through the era map")
  }

  test("emax never regresses across a restore (replayed epochs stay replayed)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rste").toString
    append(dir, 0, 10) // gen 0, no epochs
    val pre = DirSink.currentGen(dir).get
    // a streaming epoch publish moves the high-water mark
    val chk = java.nio.file.Files.createTempDirectory("graft_rste_chk")
    val src = java.nio.file.Files.createTempDirectory("graft_rste_src")
    spark.range(100, 105).select(col("id"), (col("id") * 7).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(src.toString)
    val q = spark.readStream.schema("id BIGINT, v BIGINT")
      .parquet(src.toString)
      .writeStream.format(fmt).option("path", dir)
      .option("checkpointLocation", chk.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val emaxBefore = DirSink.committedEpochMax(dir)
    assert(emaxBefore.isDefined, "fixture: the stream must have committed")
    DirSink.restore(dir, pre)
    assert(load(dir).count() == 10, "the epoch generation is undone…")
    assert(DirSink.committedEpochMax(dir) == emaxBefore,
      "…but its epoch high-water survives: a recovering writer must " +
        "never double-publish an epoch the restore erased the rows of")
  }

  test("SQL: RESTORE TABLE … TO VERSION AS OF / TIMESTAMP AS OF; vacuumed eras refuse") {
    val s = spark
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.rst")
    s.sql("CREATE TABLE graftcat.rst.t AS SELECT id, id * 7 AS v FROM range(10)")
    val wh = s.conf.get("spark.sql.catalog.graftcat.warehouse")
    val dir = s"$wh/rst/t"
    val pre = DirSink.currentGen(dir).get
    Thread.sleep(5)
    val cut = System.currentTimeMillis()
    Thread.sleep(5)
    s.sql("INSERT INTO graftcat.rst.t SELECT id, id * 7 FROM range(10, 20)")
    s.sql("DELETE FROM graftcat.rst.t WHERE id < 5")
    val r = s.sql(s"RESTORE TABLE graftcat.rst.t TO VERSION AS OF $pre")
      .head
    assert(r.getLong(0) == pre && r.getLong(1) > pre && r.getLong(2) >= 1L,
      s"RESTORE must report (version, new gen, files): $r")
    assert(s.sql("SELECT count(*) FROM graftcat.rst.t").head.getLong(0) == 10)
    // timestamp form resolves to the same era
    s.sql("INSERT INTO graftcat.rst.t SELECT id, id * 7 FROM range(20, 25)")
    s.sql(s"RESTORE graftcat.rst.t TO TIMESTAMP AS OF $cut")
    assert(s.sql("SELECT count(*) FROM graftcat.rst.t").head.getLong(0) == 10)
    // a generation behind retention refuses loudly
    s.sql("INSERT INTO graftcat.rst.t SELECT id, id * 7 FROM range(30, 35)")
    DirSink.vacuum(dir, olderThanMs = 0L)
    val e = intercept[Exception] {
      DirSink.restore(dir, pre)
    }
    assert(e.getMessage.contains("reconstructible") ||
      e.getMessage.contains("retained"),
      s"vacuumed era must refuse, not silently restore: $e")
  }
}

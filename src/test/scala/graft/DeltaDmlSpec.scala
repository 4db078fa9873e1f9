package graft

import graft.sources.v2.{DirSink, DirSinkDv}
import org.scalatest.funsuite.AnyFunSuite

/** DELTA-BASED (merge-on-read) row-level DML — `UPDATE` / `MERGE` /
  * non-metadata `DELETE` as deletion vectors + appended files
  * (SupportsDelta, round 15). The laws:
  *
  *   - with vectors enabled, an UPDATE touches NO existing data file:
  *     the original files stay listed (tagged), changed rows land in
  *     an appended file — write cost ∝ the CHANGE;
  *   - MERGE (matched update + not-matched insert) is exact, and
  *     ANSWER-IDENTICAL to the same MERGE on a copy-on-write zone;
  *   - a whole-row DELETE through SQL with an untranslatable
  *     predicate takes the vector path too;
  *   - time travel to the pre-DML generation is intact;
  *   - the query's staging (incl. task-level partial vectors) is gone
  *     after commit. */
class DeltaDmlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    if (s.conf.getOption("spark.sql.catalog.graftcat").isEmpty) {
      s.conf.set("spark.sql.catalog.graftcat", "graft.sources.v2.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftcat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    }
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ddml")
    s
  }
  private def wh = spark.conf.get("spark.sql.catalog.graftcat.warehouse")

  private def withDv[T](body: => T): T = {
    spark.conf.set(DirSinkDv.EnabledKey, "true")
    try body finally spark.conf.unset(DirSinkDv.EnabledKey)
  }

  private def fill(t: String): Unit = {
    import spark.implicits._
    Seq(Seq(1L, 2L, 3L), Seq(11L, 12L, 13L), Seq(21L, 22L, 23L))
      .foreach { ids =>
        ids.map(i => (i, s"old$i")).toDF("id", "v").coalesce(1)
          .writeTo(s"graftcat.ddml.$t").append()
      }
  }

  test("UPDATE with vectors: no data file rewritten, changed rows appended") {
    import spark.implicits._
    spark.sql("CREATE TABLE graftcat.ddml.u (id BIGINT, v STRING)")
    fill("u")
    val dir = s"$wh/ddml/u"
    val before = DirSink.readManifest(dir).get._2.map(_._1).toSet
    withDv {
      spark.sql("UPDATE graftcat.ddml.u SET v = 'touched' WHERE id % 10 = 2")
    }
    val after = DirSink.readManifest(dir).get._2.map(_._1).toSet
    assert(before.subsetOf(after),
      s"merge-on-read: every original file survives: $before -> $after")
    assert((after -- before).size >= 1, "changed rows land in appended files")
    assert(DirSink.readManifestLines(dir).get._2.count(_.contains("dv="))
      == 3, "each touched original is vector-tagged")
    val got = spark.sql("SELECT id, v FROM graftcat.ddml.u")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(1L -> "old1", 2L -> "touched", 3L -> "old3",
      11L -> "old11", 12L -> "touched", 13L -> "old13",
      21L -> "old21", 22L -> "touched", 23L -> "old23"), s"got $got")
    assert(!new java.io.File(dir, "_staging").exists(),
      "staging (incl. partial vectors) is swept on commit")
  }

  test("MERGE with vectors equals MERGE with copy-on-write") {
    import spark.implicits._
    spark.sql("CREATE TABLE graftcat.ddml.m_dv (id BIGINT, v STRING)")
    spark.sql("CREATE TABLE graftcat.ddml.m_cow (id BIGINT, v STRING)")
    fill("m_dv"); fill("m_cow")
    Seq((2L, "upd2"), (13L, "upd13"), (50L, "new50"), (60L, "new60"))
      .toDF("id", "nv").createOrReplaceTempView("src")
    val merge =
      """MERGE INTO graftcat.ddml.%s t USING src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)"""
        .stripMargin
    withDv { spark.sql(merge.format("m_dv")) }
    spark.sql(merge.format("m_cow"))
    val a = spark.sql("SELECT id, v FROM graftcat.ddml.m_dv ORDER BY id, v")
      .collect().map(_.toSeq).toSeq
    val b = spark.sql("SELECT id, v FROM graftcat.ddml.m_cow ORDER BY id, v")
      .collect().map(_.toSeq).toSeq
    assert(a == b, s"merge-on-read must equal copy-on-write:\n$a\n$b")
    assert(a.exists(_.head == 50L) && a.exists(_.head == 2L))
    assert(DirSink.readManifestLines(s"$wh/ddml/m_dv").get._2
      .exists(_.contains("dv=")), "the DV side used vectors")
    assert(!DirSink.readManifestLines(s"$wh/ddml/m_cow").get._2
      .exists(_.contains("dv=")), "the CoW side did not")
  }

  test("t$files surfaces per-file vector cardinality — the OPTIMIZE-me signal") {
    spark.sql("CREATE TABLE graftcat.ddml.f (id BIGINT, v STRING)")
    fill("f")
    withDv {
      spark.sql("DELETE FROM graftcat.ddml.f WHERE id % 10 = 1")
    }
    val rows = spark.sql(
      "SELECT rows, dv_rows FROM graftcat.ddml.`f$files` ORDER BY file")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.count(_._2 == 1L) == 3,
      s"each touched file reports its dead-row count: ${rows.toSeq}")
    // the ratio IS the signal: sum(dv_rows)/sum(rows) from metadata
    val sig = spark.sql(
      """SELECT CAST(sum(coalesce(dv_rows, 0)) AS DOUBLE) / sum(rows)
        |FROM graftcat.ddml.`f$files`""".stripMargin).head.getDouble(0)
    assert(math.abs(sig - 3.0 / 9.0) < 1e-9, s"dead fraction: $sig")
  }

  test("SQL DELETE with an untranslatable predicate takes the vector path") {
    import spark.implicits._
    spark.sql("CREATE TABLE graftcat.ddml.d (id BIGINT, v STRING)")
    fill("d")
    val dir = s"$wh/ddml/d"
    val before = DirSink.readManifest(dir).get._2.map(_._1).toSet
    val preGen = DirSink.currentGen(dir).get
    withDv {
      spark.sql("DELETE FROM graftcat.ddml.d WHERE id % 10 = 3")
    }
    assert(spark.sql("SELECT count(*) FROM graftcat.ddml.d")
      .head.getLong(0) == 6)
    assert(DirSink.readManifest(dir).get._2.map(_._1).toSet == before,
      "pure deletes append nothing and rewrite nothing")
    assert(DirSink.readManifestLines(dir).get._2.count(_.contains("dv="))
      == 3)
    // time travel: the pre-DML generation is intact
    val pre = spark.read.format("graft.sources.v2.DirSinkSource")
      .option("path", dir).option("asOfVersion", preGen.toString).load()
    assert(pre.count() == 9)
  }
}

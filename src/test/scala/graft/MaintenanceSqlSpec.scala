package graft

import graft.sources.v2.DirSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZE / VACUUM as SQL (plans.GraftSqlParser, injected through
  * GraftExtensions): the table format's maintenance operations become
  * statements any SQL client can issue — `OPTIMIZE zone [CLUSTER BY
  * (cols)] [TARGET n FILES]` compacts through DirSink.compact;
  * `VACUUM zone [RETAIN n HOURS] [DRY RUN]` sweeps unreferenced
  * orphans through DirSink.vacuum. Every other statement delegates to
  * Spark's parser untouched. */
class MaintenanceSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def freshCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_maint").toString
    val cat = s"maintcat_${math.abs(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    (cat, wh)
  }

  test("OPTIMIZE compacts, clusters, preserves rows, and reports (before, after, rows)") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v DOUBLE)")
    (0 until 6).foreach { i =>
      spark.sql(s"INSERT INTO $cat.db.t " +
        s"SELECT id, CAST(id AS DOUBLE) FROM range(${i * 100}, ${i * 100 + 100})")
    }
    val dir = s"$wh/db/t"
    val before = DirSink.readManifest(dir).get._2.size
    assert(before >= 6)
    val res = spark.sql(s"OPTIMIZE $cat.db.t CLUSTER BY (k) TARGET 2 FILES")
      .collect()
    assert(res.length == 1)
    assert(res.head.getLong(0) == before && res.head.getLong(1) == 2 &&
      res.head.getLong(2) == 600)
    assert(spark.table(s"$cat.db.t").count() == 600)
    // clustered output: a narrow range predicate now plans one file
    val (sch, entries) = DirSink.readManifestEntries(dir).get
    assert(entries.size == 2)
    assert(DirSink.history(dir).map(_.op).last == "compact")
  }

  test("VACUUM sweeps orphans the manifest never references; DRY RUN only lists") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.z AS SELECT id FROM range(10)")
    val dir = s"$wh/db/z"
    // plant an orphan (a crashed job's renamed-but-unpublished file)
    val orphan = new java.io.File(dir, "gdeadbeef-p0-t0")
    java.nio.file.Files.write(orphan.toPath, "junk".getBytes)
    Thread.sleep(60)
    val dry = spark.sql(s"VACUUM $cat.db.z RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getString(0))
    assert(dry.contains("gdeadbeef-p0-t0"))
    assert(orphan.exists, "DRY RUN must not delete")
    val swept = spark.sql(s"VACUUM $cat.db.z RETAIN 0 HOURS")
      .collect().map(_.getString(0))
    assert(swept.contains("gdeadbeef-p0-t0") && !orphan.exists)
    assert(spark.table(s"$cat.db.z").count() == 10,
      "vacuum never touches manifest-referenced files")
  }

  test("TRUNCATE TABLE empties the zone through the metadata DELETE path") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.tr AS SELECT id FROM range(100)")
    spark.sql(s"TRUNCATE TABLE $cat.db.tr")
    assert(spark.table(s"$cat.db.tr").count() == 0)
    assert(DirSink.readManifest(s"$wh/db/tr").get._2.isEmpty,
      "truncate must drop every manifest line")
    // the zone stays writable at the next generation
    spark.sql(s"INSERT INTO $cat.db.tr SELECT id FROM range(7)")
    assert(spark.table(s"$cat.db.tr").count() == 7)
  }

  test("defaults and guards: bare OPTIMIZE targets core count; non-graft tables refuse; other SQL delegates") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.d AS SELECT id FROM range(100)")
    val res = spark.sql(s"OPTIMIZE $cat.db.d").collect()
    assert(res.head.getLong(2) == 100)
    // a non-graft table (temp view) is a loud error
    spark.range(5).createOrReplaceTempView("not_a_zone")
    intercept[Exception] { spark.sql("OPTIMIZE not_a_zone").collect() }
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 AS one").head.getInt(0) == 1)
    // and a malformed OPTIMIZE falls through to a parse error, not a
    // silent no-op
    intercept[Exception] { spark.sql(s"OPTIMIZE $cat.db.d CLUSTER BY") }
  }

  test("REORG APPLY (PURGE): only vectored files rewrite; history records it; pre-purge travel serves the vectors (round 16)") {
    import spark.implicits._
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.r (id BIGINT, v BIGINT)")
    // 4 range-clustered files, ids 0..99
    (0 until 4).foreach { k =>
      spark.range(k * 25L, k * 25L + 25L)
        .select($"id", ($"id" % 7).as("v")).coalesce(1)
        .writeTo(s"$cat.db.r").append()
    }
    val dir = s"$wh/db/r"
    // a scattered DV DELETE tags 2 of the 4 files
    spark.conf.set(graft.sources.v2.DirSinkDv.EnabledKey, "true")
    try spark.sql(s"DELETE FROM $cat.db.r WHERE id IN (3, 7, 64)")
    finally spark.conf.unset(graft.sources.v2.DirSinkDv.EnabledKey)
    val preGen = DirSink.currentGen(dir).get
    val entries = DirSink.readManifestEntries(dir).get._2
    val vectored = entries.filter(_.dv.isDefined).map(_.name).toSet
    val clean = entries.filterNot(_.dv.isDefined).map(_.name).toSet
    assert(vectored.size == 2 && clean.size == 2, s"fixture: $entries")

    val res = spark.sql(s"REORG TABLE $cat.db.r APPLY (PURGE)").head
    assert(res.getLong(0) == 2 && res.getLong(2) == 97L,
      s"2 files purged, 97 live rows: $res")
    val after = DirSink.readManifestEntries(dir).get._2
    assert(after.forall(_.dv.isEmpty), "no tag survives the purge")
    assert(clean.subsetOf(after.map(_.name).toSet),
      "unvectored files keep their manifest identity (never rewritten)")
    assert(after.map(_.name).toSet.intersect(vectored).isEmpty)
    assert(DirSink.history(dir).map(_.op).last == "reorg-purge")
    // answers unchanged, live rows only
    assert(spark.table(s"$cat.db.r").count() == 97)
    assert(spark.table(s"$cat.db.r").filter($"id" === 3L).count() == 0)
    // pre-purge travel still serves the VECTORED view (deleted rows
    // stay dead in the snapshot — the vectors themselves survive)
    val fmtSrc = "graft.sources.v2.DirSinkSource"
    val old = spark.read.format(fmtSrc).option("path", dir)
      .option("asOfVersion", preGen).load()
    assert(old.count() == 97 &&
      old.filter($"id" === 3L).count() == 0,
      "pre-purge snapshot must still apply its deletion vectors")
    // a second REORG is a free no-op (no vectors left, no generation)
    val gen = DirSink.currentGen(dir).get
    assert(spark.sql(s"REORG TABLE $cat.db.r APPLY (PURGE)").head
      .getLong(0) == 0)
    assert(DirSink.currentGen(dir).contains(gen))
  }
}

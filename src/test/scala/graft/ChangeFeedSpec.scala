package graft

import graft.sources.v2.{ChangeFeed, DirSink}
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** CHANGE DATA FEED (round-13 verdict task 5): an incremental consumer
  * reads EXACTLY the row-level changes between two generations —
  * appends surface as inserts, DELETE/UPDATE/MERGE rewrites as
  * delete/insert pairs derived from the old/new file generations, and
  * rows merely CARRIED by a rewrite (the unmodified remainder of a
  * rewritten file, or a whole compaction) never appear. That property
  * is what bounds a downstream incremental dedup's work by the change,
  * not by the rewrite. */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val fmt = "graft.sources.v2.DirSinkSource"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_cdf").toString

  private def feed(dir: String, from: Long,
                   to: Option[Long] = None): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    // project the identity columns: _commit_timestamp (round 15) is
    // wall-clock and has its own CdfStreamSpec law
    ChangeFeed.read(spark, dir, from, to)
      .select($"id", $"v",
        org.apache.spark.sql.functions.col(ChangeFeed.ChangeTypeCol),
        org.apache.spark.sql.functions.col(ChangeFeed.CommitVersionCol))
      .as[(Long, String, String, Long)].collect().toSeq
      .sortBy(t => (t._4, t._3, t._1))
  }

  test("append + DELETE + UPDATE: exactly the changed rows, as delete/insert pairs") {
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val dir = tmpDir()
    // gen 0: two rows in ONE file (the carried row rides beside the
    // doomed one — the false-churn trap the exceptAll must cancel)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    // gen 1: one more row
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    // gen 2: DELETE id=1 — a copy-on-write rewrite of gen 0's file,
    // which CARRIES row 2 into a new file
    new graft.sources.v2.DirSinkTable(dir,
      StructType.fromDDL("id BIGINT, v STRING"))
      .deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("id", 1L)))
    val all = feed(dir, from = 0)
    assert(all == Seq(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (3L, "c", "insert", 1L),
      (1L, "a", "delete", 2L)),
      s"row 2 was CARRIED by the rewrite and must not appear: $all")
    // an incremental consumer resumes mid-history
    assert(feed(dir, from = 2) == Seq((1L, "a", "delete", 2L)))
    // inclusive ending bound
    assert(feed(dir, from = 0, to = Some(1)).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("a compaction is row-preserving: its change set is EMPTY") {
    import spark.implicits._
    val dir = tmpDir()
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(SaveMode.Append).save()
    }
    DirSink.compact(spark, dir, targetFiles = 1)
    val head = DirSink.currentGen(dir).get
    assert(feed(dir, from = head).isEmpty,
      "OPTIMIZE rewrites every file but changes no row")
  }

  test("MERGE through the catalog: modified rows pair up, untouched rows stay silent") {
    import spark.implicits._
    val s = spark
    if (s.conf.getOption("spark.sql.catalog.graftcat").isEmpty) {
      s.conf.set("spark.sql.catalog.graftcat", "graft.sources.v2.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftcat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    }
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.cdf")
    s.sql("DROP TABLE IF EXISTS graftcat.cdf.t")
    s.sql("CREATE TABLE graftcat.cdf.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO graftcat.cdf.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    s.sql(
      """MERGE INTO graftcat.cdf.t t USING (
        |  SELECT * FROM VALUES (2, 'B2'), (9, 'new') AS src(id, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        |""".stripMargin)
    val dir = s.conf.get("spark.sql.catalog.graftcat.warehouse") + "/cdf/t"
    val head = DirSink.currentGen(dir).get
    val changes = feed(dir, from = head)
    assert(changes == Seq(
      (2L, "b", "delete", head),
      (2L, "B2", "insert", head), (9L, "new", "insert", head)),
      s"MERGE must surface one delete/insert pair + the new insert, " +
        s"never rows 1/3: $changes")
  }

  test("retention and schema changes fail loudly, never truncate silently") {
    import spark.implicits._
    val dir = tmpDir()
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(SaveMode.Append).save()
    }
    assert(feed(dir, from = 2).map(_._1) == Seq(2L, 3L),
      "feeds inside retention work")
    DirSink.vacuum(dir, olderThanMs = 0) // retains only the head
    val e = intercept[Exception] { feed(dir, from = 2) }
    assert(e.getMessage.contains("reconstructible"),
      s"a feed from behind retention must fail loudly: $e")
    // schema evolution inside the requested range is refused (a feed
    // row needs ONE schema) — fresh zone so the boundary is in range
    val dir2 = tmpDir()
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", dir2)
      .mode(SaveMode.Append).save()
    DirSink.evolveSchema(dir2,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v STRING, x BIGINT"))
    Seq((9L, "n", 1L)).toDF("id", "v", "x").coalesce(1)
      .write.format(fmt).option("path", dir2)
      .mode(SaveMode.Append).save()
    val e2 = intercept[UnsupportedOperationException] {
      ChangeFeed.read(spark, dir2, startingVersion = 0).collect()
    }
    assert(e2.getMessage.contains("schema"))
  }

  test("table_changes TVF: the feed as SQL, path and catalog forms, composable") {
    import spark.implicits._
    val dir = tmpDir()
    spark.range(0, 10).select($"id", ($"id" * 7).as("v")).coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    spark.range(10, 15).select($"id", ($"id" * 7).as("v")).coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    // path form, full range
    assert(spark.sql(s"SELECT * FROM table_changes('$dir', 0)")
      .count() == 15)
    // ending version bounds the range; the TVF composes with SQL
    assert(spark.sql(
      s"""SELECT _change_type, count(*) AS n
          FROM table_changes('$dir', 0, 0) GROUP BY 1""")
      .as[(String, Long)].collect().toSeq == Seq(("insert", 10L)))
    // catalog-name form resolves through the session catalog manager
    val wh = java.nio.file.Files.createTempDirectory("graft_tvf").toString
    val cat = s"tvfcat_${math.abs(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t AS SELECT id FROM range(5)")
    val feedRows = spark.sql(
      s"SELECT * FROM table_changes('$cat.db.t', 0)").count()
    assert(feedRows == 5)
    // other TVFs are untouched by the rule
    assert(spark.sql("SELECT count(*) FROM range(7)").head.getLong(0) == 7)
  }
}

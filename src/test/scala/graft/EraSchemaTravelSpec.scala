package graft

import graft.sources.v2.{ChangeFeed, DirSink}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ERA-SCHEMA TIME TRAVEL (round-15 verdict task 3 + the round-14
  * advisor's medium finding): `VERSION AS OF g` / `TIMESTAMP AS OF t`
  * resolve generation g's OWN schema and column mapping — both already
  * live in g's manifest header — instead of reading era files through
  * the head's. The laws:
  *
  *   - a pre-evolve snapshot has NO post-evolve NULL-tail columns;
  *   - a pre-rename snapshot reads under the OLD names, with values;
  *   - the double-rename window (a→b→c, read at era b) returns the
  *     era's VALUES — under head-mapping resolution it silently
  *     returned all NULLs (the advisor's wrong-answer window);
  *   - a pre-DROP snapshot surfaces the dropped column WITH its data
  *     (the parquet plane resolves by physical name — bytes retained);
  *   - TIMESTAMP AS OF follows the same era discipline;
  *   - the change-feed surfaces keep HEAD-schema normalization (a feed
  *     row speaks one schema across its range) via the internal
  *     `eraSchema=false` decode. */
class EraSchemaTravelSpec extends AnyFunSuite {
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

  private def freshZone(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_era").toString
    spark.range(0, 20).select(col("id"), (col("id") * 7).as("v"))
      .coalesce(2).write.format(fmt).option("path", dir)
      .mode(SaveMode.Overwrite).save()
    dir
  }

  private def at(dir: String, gen: Long) =
    spark.read.format(fmt).option("path", dir)
      .option("asOfVersion", gen).load()

  test("pre-evolve snapshot reads WITHOUT the post-evolve NULL tail") {
    val dir = freshZone()
    val preEvolve = DirSink.currentGen(dir).get
    DirSink.evolveSchema(dir, org.apache.spark.sql.types.StructType
      .fromDDL("id BIGINT, v BIGINT, extra STRING"))
    spark.range(20, 25).select(col("id"), (col("id") * 7).as("v"),
      lit("new").as("extra")).coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    assert(spark.read.format(fmt).option("path", dir).load()
      .columns.toSeq == Seq("id", "v", "extra"))
    val old = at(dir, preEvolve)
    assert(old.columns.toSeq == Seq("id", "v"),
      s"pre-evolve snapshot must not carry the NULL tail: ${old.columns.toSeq}")
    assert(old.count() == 20)
  }

  test("double rename a->b->c: the era-b snapshot returns VALUES, not NULLs") {
    val dir = freshZone()
    DirSink.renameColumn(dir, "v", "b_name")
    val eraB = DirSink.currentGen(dir).get
    DirSink.renameColumn(dir, "b_name", "c_name")
    val mid = at(dir, eraB)
    assert(mid.columns.toSeq == Seq("id", "b_name"),
      s"the era speaks its own names: ${mid.columns.toSeq}")
    assert(mid.filter(col("b_name").isNull).count() == 0,
      "era colmap must resolve b_name to the physical 'v' chunk — " +
        "head-mapping resolution read this column as all NULL")
    assert(mid.agg(sum("b_name")).head.getLong(0) ==
      (0L until 20L).map(_ * 7).sum)
    // filters push through the era mapping too
    assert(mid.filter(col("b_name") === 49L).count() == 1)
  }

  test("rename back a->b->a: the era-b snapshot still resolves") {
    val dir = freshZone()
    DirSink.renameColumn(dir, "v", "b_name")
    val eraB = DirSink.currentGen(dir).get
    DirSink.renameColumn(dir, "b_name", "v")
    assert(DirSink.zoneColMap(dir).isEmpty, "rename-back drops the map")
    val mid = at(dir, eraB)
    assert(mid.columns.toSeq == Seq("id", "b_name"))
    assert(mid.agg(sum("b_name")).head.getLong(0) ==
      (0L until 20L).map(_ * 7).sum)
  }

  test("pre-DROP snapshot surfaces the dropped column with its data") {
    val dir = freshZone()
    val preDrop = DirSink.currentGen(dir).get
    DirSink.dropColumn(dir, "v")
    assert(spark.read.format(fmt).option("path", dir).load()
      .columns.toSeq == Seq("id"))
    val old = at(dir, preDrop)
    assert(old.columns.toSeq == Seq("id", "v"),
      "the drop is metadata-only: the era schema brings the column back")
    assert(old.agg(sum("v")).head.getLong(0) ==
      (0L until 20L).map(_ * 7).sum,
      "the dropped column's BYTES are still in the files")
  }

  test("catalog SQL: VERSION AS OF and TIMESTAMP AS OF speak era schemas") {
    val s = spark
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.era")
    s.sql("CREATE TABLE graftcat.era.t (id BIGINT, v BIGINT)")
    s.sql("INSERT INTO graftcat.era.t VALUES (1, 10), (2, 20)")
    val wh = s.conf.get("spark.sql.catalog.graftcat.warehouse")
    val dir = s"$wh/era/t"
    val preGen = DirSink.currentGen(dir).get
    Thread.sleep(5)
    val cutMs = System.currentTimeMillis()
    Thread.sleep(5)
    s.sql("ALTER TABLE graftcat.era.t ADD COLUMNS (extra STRING)")
    s.sql("ALTER TABLE graftcat.era.t RENAME COLUMN v TO weight")
    s.sql("INSERT INTO graftcat.era.t VALUES (3, 30, 'x')")
    assert(s.sql("SELECT * FROM graftcat.era.t").columns.toSeq ==
      Seq("id", "weight", "extra"))
    val snap = s.sql(s"SELECT * FROM graftcat.era.t VERSION AS OF $preGen")
    assert(snap.columns.toSeq == Seq("id", "v"),
      s"VERSION AS OF must speak the era's schema: ${snap.columns.toSeq}")
    assert(snap.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L), (2L, 20L)))
    val tsSnap = s.sql(
      s"SELECT * FROM graftcat.era.t TIMESTAMP AS OF timestamp_millis(${cutMs}L)")
    assert(tsSnap.columns.toSeq == Seq("id", "v"),
      s"TIMESTAMP AS OF must speak the era's schema: ${tsSnap.columns.toSeq}")
    assert(tsSnap.count() == 2)
  }

  test("the change feed keeps HEAD normalization across era files") {
    val dir = freshZone()
    val birth = DirSink.currentGen(dir).get
    DirSink.renameColumn(dir, "v", "weight")
    spark.range(20, 25).select(col("id"), (col("id") * 7).as("weight"))
      .coalesce(1).write.format(fmt).option("path", dir)
      .mode(SaveMode.Append).save()
    // a feed spanning the rename emits ONE schema — the head's names —
    // and the pre-rename rows carry their values through the head map
    val feed = ChangeFeed.read(spark, dir, birth)
    assert(feed.columns.take(2).toSeq == Seq("id", "weight"))
    assert(feed.filter(col("weight").isNull).count() == 0)
    assert(feed.count() == 25)
  }
}

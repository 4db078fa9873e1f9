package graft

import graft.sources.v2.DirSink
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** INCREMENTAL OPTIMIZE — bin-packing below a size threshold
  * (sources.v2.DirSink.compactSmall, `OPTIMIZE … SMALLER THAN n`):
  * the nightly-maintenance shape for a streaming landing zone must
  * cost O(new small files), not O(zone). The laws:
  *
  *   - right-sized files' manifest lines survive VERBATIM (same names,
  *     same stats text) — their bytes are never read or rewritten;
  *   - the packed rewrite is row-preserving and keeps the zone
  *     readable byte-for-byte (read-back equality);
  *   - a second run with nothing small is a free no-op (generation
  *     unchanged — the O(new data) claim at its fixpoint);
  *   - bucket purity survives the packing on a bucketed zone;
  *   - pre-optimize generations stay time-travelable (retained log);
  *   - the SQL surface composes with CLUSTER BY and (round 16)
  *     ZORDER BY — the packed tail z-orders against ZONE-global bounds
  *     so its files carry tight hyper-rectangles on the same grid a
  *     full rewrite would use — and refuses TARGET (whole-zone). */
class IncrementalOptimizeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val fmt = "graft.sources.v2.DirSinkSource"

  /** 2 big appends (~1000 rows each) + 6 small ones (20 rows each). */
  private def mixedZone(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_iopt").toString
    spark.range(0, 1000).select(col("id"), (col("id") * 3).as("v"))
      .coalesce(1).write.format(fmt).option("path", dir)
      .mode(SaveMode.Overwrite).save()
    spark.range(1000, 2000).select(col("id"), (col("id") * 3).as("v"))
      .coalesce(1).write.format(fmt).option("path", dir)
      .mode(SaveMode.Append).save()
    (0 until 6).foreach { i =>
      spark.range(2000L + i * 20, 2000L + i * 20 + 20)
        .select(col("id"), (col("id") * 3).as("v")).coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(SaveMode.Append).save()
    }
    dir
  }

  /** A threshold between the small files' and big files' sizes. */
  private def threshold(dir: String): Long = {
    val sizes = DirSink.readManifestEntries(dir).get._2.flatMap(_.bytes)
    (sizes.min + sizes.max) / 2
  }

  test("only small files rewrite; big lines survive verbatim; rows and read-back preserved") {
    val dir = mixedZone()
    val before = DirSink.readManifestEntries(dir).get._2
    val bigNames = before.sortBy(-_.bytes.getOrElse(0L)).take(2)
      .map(_.name).toSet
    val expect = spark.read.format(fmt).option("path", dir).load()
      .collect().map(_.toSeq).toSet
    val thr = threshold(dir)
    val (rewrote, created) = DirSink.compactSmall(spark, dir, thr)
    assert(rewrote == 6 && created >= 1 && created <= 2,
      s"6 small files must pack into ~1 ($rewrote -> $created)")
    val after = DirSink.readManifestEntries(dir).get._2
    assert(after.size == 2 + created)
    assert(bigNames.subsetOf(after.map(_.name).toSet),
      "right-sized files keep their manifest identity")
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.collect().map(_.toSeq).toSet == expect,
      "packing must preserve every row exactly")
    // CONVERGENCE under one threshold: floor-sizing reaches a fixpoint
    // in a bounded number of passes, and the fixpoint pass is a free
    // no-op (no generation published — the O(new data) claim)
    var passes = 0
    while (DirSink.compactSmall(spark, dir, thr) != ((0, 0)) && passes < 3)
      passes += 1
    assert(passes < 3, "packing must converge under a fixed threshold")
    val genAfter = DirSink.currentGen(dir).get
    assert(DirSink.compactSmall(spark, dir, thr) == ((0, 0)))
    assert(DirSink.currentGen(dir).contains(genAfter),
      "a no-op pack must not publish a generation")
    assert(spark.read.format(fmt).option("path", dir).load()
      .collect().map(_.toSeq).toSet == expect)
  }

  test("clusterBy gives the packed tail skippable bounds; pre-pack generations stay travelable") {
    val dir = mixedZone()
    val preGen = DirSink.currentGen(dir).get
    DirSink.compactSmall(spark, dir, threshold(dir), clusterBy = Seq("id"))
    // pre-pack snapshot reads (retained log keeps the rewritten files)
    val old = spark.read.format(fmt).option("path", dir)
      .option("asOfVersion", preGen).load()
    assert(old.count() == 2120)
    // the packed tail is id-clustered: a tail band plans few files
    graft.sources.v2.DirSinkPrune.lastKept = -1
    assert(spark.read.format(fmt).option("path", dir).load()
      .filter(col("id") >= 2100).count() == 20)
    assert(graft.sources.v2.DirSinkPrune.lastKept <= 2,
      "a packed+clustered tail band must prune to its covering file(s)")
  }

  test("bucket purity survives the packing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_iopt_b")
      .toString
    spark.range(0, 500).select(col("id"), (col("id") * 3).as("v"))
      .write.format(fmt).option("path", dir).option("bucket", "id:4")
      .mode(SaveMode.Overwrite).save()
    (0 until 4).foreach { i =>
      spark.range(500L + i * 10, 500L + i * 10 + 10)
        .select(col("id"), (col("id") * 3).as("v")).coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(SaveMode.Append).save()
    }
    DirSink.compactSmall(spark, dir, threshold(dir))
    val entries = DirSink.readManifestEntries(dir).get._2
    assert(entries.forall(_.bucket.isDefined),
      "every packed file must carry its bucket tag")
    val byFile = entries.map(e => e.name -> e.bucket.get).toMap
    val pure = spark.read.format(fmt).option("path", dir).load()
      .select(col("_file"), col("id")).collect().forall { r =>
        DirSink.bucketId(r.get(1), 4) == byFile(r.getString(0))
      }
    assert(pure, "bucket purity must survive the packing")
    assert(spark.read.format(fmt).option("path", dir).load()
      .count() == 540)
  }

  test("SQL: OPTIMIZE … SMALLER THAN packs incrementally; TARGET/ZORDER combinations refuse") {
    val wh = java.nio.file.Files.createTempDirectory("graft_iopt_sql")
      .toString
    val cat = s"ioptcat_${math.abs(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t AS SELECT id, id * 2 AS v " +
      "FROM range(1000)")
    (0 until 5).foreach { i =>
      spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 2 FROM " +
        s"range(${1000 + i * 10}, ${1000 + i * 10 + 10})")
    }
    val thr = threshold(s"$wh/db/t")
    val row = spark.sql(
      s"OPTIMIZE $cat.db.t CLUSTER BY (id) SMALLER THAN $thr").head
    assert(row.getLong(2) == 1050L, "row-preserving")
    assert(row.getLong(1) < row.getLong(0),
      s"packing must shrink the file count (${row.getLong(0)} -> " +
        s"${row.getLong(1)})")
    intercept[Exception] {
      spark.sql(s"OPTIMIZE $cat.db.t TARGET 4 FILES SMALLER THAN 1 MB")
    }
  }

  /** Planned file NAMES for a filtered read (the band-planning probe,
    * scoped so packed-tail and untouched files can be told apart). */
  private def plannedNames(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[graft.sources.v2.DirSinkScan]
    }.get.planInputPartitions().collect {
      case fp: graft.sources.v2.DirSinkFilePartition => fp.file
    }.toSet
  }

  test("incremental ZORDER: packed tail carries tight hyper-rectangles on the zone grid; converges (round 16)") {
    import spark.implicits._
    // build TWO identical zones: one packs with ZORDER BY, the control
    // packs unordered — the discriminating fact is the packed files'
    // band-planning, everything else held equal
    def build(): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_iopt_z").toString
      // big: the full 100×100 grid, z-ordered whole-zone into 4 files
      spark.range(10000)
        .select(($"id" % 100L).as("x"), ($"id" / 100L).cast("long").as("y"),
          $"id".as("payload"))
        .repartition(4)
        .write.format(fmt).option("path", dir)
        .mode(SaveMode.Overwrite).save()
      DirSink.compact(spark, dir, targetFiles = 4, zorderBy = Seq("x", "y"))
      // tail: 8 small scrambled drops spanning the SAME grid range
      (0 until 8).foreach { i =>
        spark.range(i * 250L, i * 250L + 250L)
          .select((($"id" * 37L) % 100L).as("x"),
            (($"id" * 61L) % 100L).as("y"), $"id".as("payload"))
          .coalesce(1).write.format(fmt).option("path", dir)
          .mode(SaveMode.Append).save()
      }
      dir
    }
    val zd = build()
    val cd = build()
    val entries0 = DirSink.readManifestEntries(zd).get._2
    val bigNames = entries0.sortBy(-_.bytes.getOrElse(0L)).take(4)
      .map(_.name).toSet
    val smallSz = entries0.sortBy(_.bytes.getOrElse(0L)).head.bytes.get
    val thr = smallSz * 2 // 8 small files → ~4 z-tiled outputs
    val (rz, cz) = DirSink.compactSmall(spark, zd, thr,
      zorderBy = Seq("x", "y"))
    val (rc, cc) = DirSink.compactSmall(spark, cd, thr)
    assert(rz == 8 && rc == 8 && cz >= 3 && cz == cc,
      s"both zones pack the same tail: z=($rz->$cz) control=($rc->$cc)")
    // right-sized (already z-ordered) files keep their manifest identity
    assert(bigNames.subsetOf(
      DirSink.readManifestEntries(zd).get._2.map(_.name).toSet),
      "the incremental pass must not touch right-sized files")
    val packedZ = DirSink.readManifestEntries(zd).get._2
      .map(_.name).toSet -- bigNames
    val packedC = DirSink.readManifestEntries(cd).get._2
      .map(_.name).filterNot(bigNames.contains).toSet
    def readZ() = spark.read.format(fmt).option("path", zd).load()
    def readC() = spark.read.format(fmt).option("path", cd).load()
    // TIGHT HYPER-RECTANGLES: a narrow band in EITHER dim plans at most
    // half of the z-packed files; the unordered control pack spans the
    // whole grid in every file, so both bands plan ALL of its files
    val zx = plannedNames(readZ().filter($"x" < 10)).intersect(packedZ)
    val zy = plannedNames(readZ().filter($"y" < 10)).intersect(packedZ)
    assert(zx.size <= packedZ.size / 2,
      s"x-band must skip z-packed files: ${zx.size} of ${packedZ.size}")
    assert(zy.size <= packedZ.size / 2,
      s"y-band must skip z-packed files: ${zy.size} of ${packedZ.size}")
    val cx = plannedNames(readC().filter($"x" < 10)).intersect(packedC)
    assert(cx.size > packedC.size / 2 && cx.size > zx.size,
      s"an unordered pack mostly cannot skip (round-robin files span " +
        s"the grid): planned ${cx.size} of ${packedC.size}, z planned " +
        s"${zx.size}")
    // row preservation + convergence (the fixpoint is a free no-op)
    assert(readZ().count() == 12000)
    // z-range partitions are not byte-uniform, so a couple of follow-up
    // passes may re-pack the undersized tail — the fixpoint must still
    // arrive in bounded passes and then be a free no-op
    var passes = 0
    while (DirSink.compactSmall(spark, zd, thr,
        zorderBy = Seq("x", "y")) != ((0, 0)) && passes < 4)
      passes += 1
    assert(passes < 4, "repeated incremental ZORDER must converge")
    assert(readZ().count() == 12000)
    // the SQL surface composes
    val cat = s"ioptzcat_${math.abs(zd.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      new java.io.File(zd).getParent)
    val tbl = s"$cat.`${new java.io.File(zd).getName}`"
    val row = spark.sql(
      s"OPTIMIZE $tbl ZORDER BY (x, y) SMALLER THAN $thr").head
    assert(row.getLong(2) == 12000L, "row-preserving, and a no-op pack")
  }
}

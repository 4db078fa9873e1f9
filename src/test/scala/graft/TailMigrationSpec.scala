package graft

import graft.sources.v2.{DirSink, DirSinkMicroBatchStream, DirSinkOffset}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** CHECKPOINT MIGRATION across compaction (round-11 verdict task 7 —
  * scenario G's fail-fast was correct but terminal): `compact()` records
  * an `old:new` offset remap in the manifest header, and a restarting
  * tail whose checkpoint had consumed EXACTLY the whole pre-compact zone
  * resumes at the post-compact count — no reread, no loss. Offsets carry
  * a coordinate EPOCH (`files@compactions`) so a post-compact offset
  * that numerically equals the pre-compact count can never be
  * mis-migrated; a checkpoint stopped MID-history still fails loudly
  * (its unread suffix was rewritten — exactly-once cannot survive it). */
class TailMigrationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val fmt = "graft.sources.v2.DirSinkSource"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tailmig").toString

  test("quiesce → compact → restart: the tail resumes with no reread and no loss") {
    import spark.implicits._
    val in = tmpDir()
    val out = tmpDir()
    val cp = tmpDir()
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    }
    def runTail(): Unit = {
      val q = spark.readStream.format(fmt).option("path", in).load()
        .writeStream.format(fmt).option("path", out)
        .option("schema", "id BIGINT, v STRING")
        .option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runTail() // consumes the whole 3-file zone; checkpoint offset = 3
    assert(spark.read.format(fmt).option("path", out).load().count() == 3)
    // the documented recipe: tail quiesced at the zone boundary → compact
    DirSink.compact(spark, in, targetFiles = 1)
    assert(DirSink.readManifest(in).get._2.size == 1)
    Seq((4L, "v4")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    runTail() // restart from the SAME checkpoint against the compacted zone
    val back = spark.read.format(fmt).option("path", out).load()
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(back == (1 to 4).map(i => (i.toLong, s"v$i")),
      s"exactly-once across the compaction: got $back")
    // a second compaction chains: the remap header accumulates and a
    // boundary checkpoint still migrates through BOTH hops
    DirSink.compact(spark, in, targetFiles = 1)
    Seq((5L, "v5")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    runTail()
    assert(spark.read.format(fmt).option("path", out).load().count() == 5,
      "the remap chain must migrate across repeated compactions")
  }

  test("mid-history checkpoint fails loudly instead of resuming into rewritten history") {
    import spark.implicits._
    val in = tmpDir()
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    }
    DirSink.compact(spark, in, targetFiles = 1) // remap records 3 -> 1
    val schema = StructType.fromDDL("id BIGINT, v STRING")
    val stream = new DirSinkMicroBatchStream(in, schema, schema)
    // a checkpoint stopped at 2/3 files (coordinate epoch 0): its unread
    // third file was rewritten into the compacted file that ALSO holds
    // rows it already emitted — no count offset can resume exactly-once
    val e = intercept[IllegalStateException] {
      stream.latestOffset(DirSinkOffset(2, 0),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("mid-history"), e.getMessage)
    // the boundary checkpoint (3@0) migrates to (1@1); a POST-compact
    // offset that happens to read 3 again (3@1) is left alone
    assert(stream.latestOffset(DirSinkOffset(3, 0),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .asInstanceOf[DirSinkOffset].copy(prefixFp = None)
      == DirSinkOffset(1, 1),
      "the fingerprint (round 15) rides on top of the migration")
    (4 to 6).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    }
    // zone is back to 4 files; an epoch-1 offset of 3 means "3 files of
    // the POST-compact zone" and must NOT be remapped back to 1
    val fresh = new DirSinkMicroBatchStream(in, schema, schema)
    val end = fresh.latestOffset(DirSinkOffset(3, 1),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .asInstanceOf[DirSinkOffset]
    assert(end.copy(prefixFp = None) == DirSinkOffset(4, 1),
      s"post-compact offsets must stay in their coordinates, got $end")
    // offset serialization: bare count at epoch 0 (legacy checkpoints
    // parse unchanged), files@epoch once a compaction has happened
    assert(DirSinkOffset(3, 0).json() == "3")
    assert(DirSinkOffset.parse("3") == DirSinkOffset(3, 0))
    assert(DirSinkOffset(1, 2).json() == "1@2")
    assert(DirSinkOffset.parse("1@2") == DirSinkOffset(1, 2))
    // round 15: the prefix fingerprint serializes after '#' and the
    // legacy forms above stay byte-identical (old checkpoints parse)
    assert(DirSinkOffset(3, 0, Some("ab12")).json() == "3#ab12")
    assert(DirSinkOffset.parse("3#ab12") ==
      DirSinkOffset(3, 0, Some("ab12")))
    assert(DirSinkOffset.parse("1@2#ff") ==
      DirSinkOffset(1, 2, Some("ff")))
  }

  test("OVERWRITE clears the remap chain: rewritten history never mis-migrates a stale checkpoint") {
    import spark.implicits._
    val in = tmpDir()
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    }
    DirSink.compact(spark, in, targetFiles = 1) // remap 3 -> 1 recorded
    assert(DirSink.offsetRemaps(in) == Seq((3, 1)))
    // a USER overwrite rewrites history: the chain must not survive —
    // otherwise a stale pre-overwrite checkpoint at the old boundary
    // (3) would silently "migrate" into the unrelated new zone
    Seq((9L, "new")).toDF("id", "v").write.format(fmt)
      .option("path", in).mode(SaveMode.Overwrite).save()
    assert(DirSink.offsetRemaps(in).isEmpty,
      "overwrite must drop pre-overwrite compaction remaps")
    // ...while compaction's own internal overwrite preserves the chain
    // across repeated compactions (pinned by the chained test above)
  }

  test("an offset AHEAD of the remap chain fails fast (history was rewritten)") {
    import spark.implicits._
    val in = tmpDir()
    (1 to 2).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    }
    // a checkpoint that had migrated through a compaction (epoch 1)
    // whose remap a user OVERWRITE then dropped: the zone now records
    // ZERO remaps, so coordinate epoch 1 proves rewritten history —
    // clamping it down would resume by count inside unrelated files
    val stream = new graft.sources.v2.DirSinkMicroBatchStream(
      in, org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v STRING"),
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING"))
    val stale = DirSinkOffset(1, 1)
    val e = intercept[IllegalStateException] {
      stream.latestOffset(stale,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("coordinate epoch"),
      s"must name the rewritten-history cause, got: ${e.getMessage}")
  }

  test("compaction publishes its remap ATOMICALLY with the overwrite (one generation)") {
    import spark.implicits._
    val in = tmpDir()
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", in).mode(SaveMode.Append).save()
    }
    val genBefore = DirSink.currentGen(in).get
    DirSink.compact(spark, in, targetFiles = 2)
    val genAfter = DirSink.currentGen(in).get
    // ONE publish carries both the rewritten file list and the remap —
    // there is no post-overwrite window in which a concurrent append
    // could inflate the remap's new side (the exactly-once hazard)
    assert(genAfter == genBefore + 1,
      s"compact must publish exactly once, gen $genBefore -> $genAfter")
    assert(DirSink.offsetRemaps(in) == Seq((4, 2)))
    assert(spark.read.format(fmt).option("path", in).load().count() == 4)
  }
}

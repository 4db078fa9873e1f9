package graft

import graft.sources.v2.{DirSink, DirSinkStreamingWrite}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMISTIC CONCURRENCY + maintenance durability of the DirSink table
  * format (round 11 closed the protocol; this round makes its two
  * documented hazards load-bearing):
  *
  *   1. CONCURRENT APPENDERS — the round-11 verdict's must-fix: two
  *      jobs appending to the same zone used to race on the manifest
  *      and silently drop the loser's files. Commits now serialize
  *      under the zone lock; BOTH generations must be readable.
  *   2. EPOCH HIGH-WATER MARK — compaction / DELETE / OVERWRITE rebuild
  *      the manifest and used to erase streaming lines' epoch ids, so a
  *      recovering streaming writer would re-commit (duplicate) an
  *      already-durable epoch. The `#emax` header must survive every
  *      rewrite.
  *   3. Vacuum sweeps crashed publishes' manifest tmp files.
  */
class ZoneConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val fmt = "graft.sources.v2.DirSinkSource"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_zone").toString

  test("two interleaved appenders: both commits' files are readable afterwards") {
    import spark.implicits._
    val dir = tmpDir()
    // many small concurrent appends — each thread appends a distinct
    // slice; without commit serialization the losers' manifest lines
    // vanish (lost update) even though their data files landed
    val slices = (0 until 8).toVector
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val writes = slices.map { i => Future {
      Seq((i.toLong, s"writer-$i")).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(SaveMode.Append).save()
    }}
    Await.result(Future.sequence(writes), 120.seconds)
    val back = spark.read.format(fmt).option("path", dir).load()
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(back == slices.map(i => (i.toLong, s"writer-$i")),
      s"every concurrent append must survive, got $back")
    // manifest sanity: 8 distinct file lines, generation advanced 8×
    val m = DirSink.readManifest(dir).get._2
    assert(m.size == 8 && m.map(_._1).distinct.size == 8)
  }

  test("TWO concurrent streaming writers race one zone: interleaved epochs, a mid-stream crash-replay each — exactly-once for both (round 16)") {
    import spark.implicits._
    val dir = tmpDir()
    // two real streaming writers (distinct stable query ids, distinct
    // checkpoints ⇒ independent epoch counters 0..9) racing the zone
    // lock; each "crashes" after epoch 5 and replays it — under its
    // OWN query id, which is what Spark's micro-batch path passes
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(qid: String, base: Long) = new Thread(() => {
      try (0 until 10).foreach { e =>
        streamCommit(dir, qid, e.toLong, base + e, s"$qid-e$e")
        if (e == 5) streamCommit(dir, qid, 5L, base + 900, s"$qid-replay")
      } catch { case t: Throwable => errs.add(t) }
    })
    val (ta, tb) = (writer("qa", 1000L), writer("qb", 2000L))
    ta.start(); tb.start(); ta.join(180000); tb.join(180000)
    assert(!ta.isAlive && !tb.isAlive, "writers must finish")
    assert(errs.isEmpty, s"writer failures: ${errs.toArray.toSeq}")
    // exactly-once BOTH streams: every (writer, epoch) row once, no
    // replay ghosts, neither writer's epochs swallowed by the other's
    // independent counter (the zone-global-emax failure mode)
    val ids = spark.read.format(fmt).option("path", dir).load()
      .as[(Long, String)].collect().toSeq.map(_._1).sorted
    assert(ids == ((1000L until 1010L) ++ (2000L until 2010L)).sorted,
      s"each stream's 10 epochs exactly once, got $ids")
    // each stream's own #txn mark stands at its last epoch
    assert(DirSink.committedTxn(dir) == Map("qa" -> 9L, "qb" -> 9L),
      s"per-writer marks: ${DirSink.committedTxn(dir)}")
    assert(DirSink.committedEpochMax(dir).contains(9L))
    // the commit-log generation chain is contiguous: 20 real commits
    // (replays publish nothing), gens 0..19, head replays cleanly
    assert(DirSink.currentGen(dir).contains(19L),
      s"20 commits, 2 silent replays: gen ${DirSink.currentGen(dir)}")
    // and a LATE replay (deeper recovery) of either stream is still a
    // no-op after all of the other stream's traffic
    streamCommit(dir, "qa", 3L, 1903L, "late-replay")
    assert(spark.read.format(fmt).option("path", dir).load().count() == 20)
  }

  test("generation counter: every publish bumps #gen; no two commits share one") {
    import spark.implicits._
    val dir = tmpDir()
    def gen(): Long = DirSink.currentGen(dir).getOrElse(-1L)
    Seq((1L, "a")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Append).save()
    val g0 = gen()
    Seq((2L, "b")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Append).save()
    assert(gen() == g0 + 1, "append must bump the generation")
    Seq((3L, "c")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Overwrite).save()
    assert(gen() == g0 + 2, "overwrite must bump the generation too")
    DirSink.evolveSchema(dir, StructType.fromDDL("id BIGINT, v STRING, x BIGINT"))
    assert(gen() == g0 + 3, "schema evolve must bump the generation")
  }

  private val streamSchema = StructType.fromDDL("id BIGINT, v STRING")
  private def row(id: Long, s: String) =
    new GenericInternalRow(Array[Any](id, UTF8String.fromString(s)))
  private def streamCommit(dir: String, qid: String, epoch: Long,
                           id: Long, v: String): Unit = {
    val sw = new DirSinkStreamingWrite(dir, streamSchema, qid,
      truncate = false)
    val w = sw.createStreamingWriterFactory(null).createWriter(0, 0L, epoch)
    w.write(row(id, v))
    sw.commit(epoch, Array(w.commit()))
  }

  test("epoch high-water mark survives COMPACTION: a replayed epoch stays a no-op") {
    import spark.implicits._
    val dir = tmpDir()
    streamCommit(dir, "run-1", 0L, 1L, "e0")
    streamCommit(dir, "run-1", 1L, 2L, "e1")
    assert(DirSink.committedEpochMax(dir).contains(1L))
    // maintenance rewrites the manifest: the epoch-carrying lines are
    // merged away, but the high-water mark must ride in the header
    DirSink.compact(spark, dir, targetFiles = 1)
    assert(DirSink.committedEpochs(dir).isEmpty,
      "compacted lines carry no epochs (they are merged files)")
    assert(DirSink.committedEpochMax(dir).contains(1L),
      "the #emax header must survive the compaction rewrite")
    // crash-recovery replay of epoch 1 AFTER the compaction: before the
    // header existed this re-committed and duplicated rows 1 and 2.
    // (The recovered run keeps its STABLE query id — Spark passes the
    // checkpoint's `id`, not the per-run `runId`, to the write.)
    streamCommit(dir, "run-1", 1L, 2L, "e1")
    val back = spark.read.format(fmt).option("path", dir).load()
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(back == Seq((1L, "e0"), (2L, "e1")),
      s"a post-compaction epoch replay must not duplicate rows, got $back")
    // ...and the NEXT epoch still lands normally
    streamCommit(dir, "run-1", 2L, 3L, "e2")
    assert(spark.read.format(fmt).option("path", dir).load().count() == 3)
  }

  test("epoch high-water mark survives DELETE and batch OVERWRITE") {
    import spark.implicits._
    val dir = tmpDir()
    streamCommit(dir, "run-1", 0L, 1L, "keep")
    streamCommit(dir, "run-1", 1L, 2L, "doomed")
    // file-aligned DELETE drops epoch-1's line entirely
    val table = new graft.sources.v2.DirSinkTable(dir, streamSchema)
    table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("id", 2L)))
    assert(DirSink.committedEpochMax(dir).contains(1L),
      "DELETE dropping an epoch-carrying line must preserve #emax")
    streamCommit(dir, "run-1", 1L, 2L, "doomed") // replay: must be a no-op
    assert(spark.read.format(fmt).option("path", dir).load().count() == 1)
    // batch OVERWRITE truncates the lines — the mark still survives
    Seq((9L, "fresh")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Overwrite).save()
    assert(DirSink.committedEpochMax(dir).contains(1L),
      "truncate must carry the epoch mark forward")
    streamCommit(dir, "run-1", 0L, 10L, "replay0")
    assert(spark.read.format(fmt).option("path", dir).load().count() == 1,
      "epochs at or below the mark must stay no-ops after overwrite")
  }

  test("a row-level rewrite whose zone advanced mid-flight fails loudly, never clobbers") {
    import spark.implicits._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    val schema = StructType.fromDDL("id BIGINT, v STRING")
    // plan a row-level operation's group scan at the current generation
    val op = new graft.sources.v2.DirSinkRowLevelOperation(dir, schema,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE)
    val scan = op.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    scan.toBatch.planInputPartitions() // captures (gen, groups)
    // a concurrent append lands between the plan and the commit
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    // the stale-generation commit must fail loudly — the alternative is
    // the rebuilt manifest silently dropping the concurrent append
    val write = new graft.sources.v2.DirSinkReplaceDataWrite(
      dir, schema, "q-conflict", op)
    val e = intercept[java.util.ConcurrentModificationException] {
      write.commit(Array.empty)
    }
    assert(e.getMessage.contains("generation"))
    // the zone is untouched: all three rows readable, gen intact
    assert(spark.read.format(fmt).option("path", dir).load().count() == 3)
    // a RE-PLANNED operation at the new generation commits fine
    val op2 = new graft.sources.v2.DirSinkRowLevelOperation(dir, schema,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE)
    op2.newScanBuilder(CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    new graft.sources.v2.DirSinkReplaceDataWrite(dir, schema, "q-retry", op2)
      .commit(Array.empty) // rewrites all groups to nothing: full delete
    assert(spark.read.format(fmt).option("path", dir).load().count() == 0,
      "an empty replace of all scanned groups empties the zone")
  }

  test("withDmlRetry: a retried rewrite commits without losing the concurrent append") {
    import spark.implicits._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    val schema = StructType.fromDDL("id BIGINT, v STRING")
    // the deterministic conflict: attempt 1 plans, then a concurrent
    // append advances the generation BEFORE the commit — exactly the
    // window catalog-SQL UPDATE/MERGE has; attempt 2 re-plans (the
    // wrapper's contract: the body builds its plan inside) and commits
    var attempts = 0
    DirSink.withDmlRetry() {
      attempts += 1
      val op = new graft.sources.v2.DirSinkRowLevelOperation(dir, schema,
        org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE)
      op.newScanBuilder(CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions()
      if (attempts == 1)
        Seq((3L, "mid-flight")).toDF("id", "v").coalesce(1)
          .write.format(fmt).option("path", dir)
          .mode(SaveMode.Append).save()
      new graft.sources.v2.DirSinkReplaceDataWrite(
        dir, schema, s"q-dmlretry-$attempts", op).commit(Array.empty)
    }
    assert(attempts == 2, s"one conflict, one clean retry; ran $attempts")
    // attempt 2's scan covered ALL THREE files (append included) and
    // replaced them with nothing: the append was SEEN, never dropped
    assert(spark.read.format(fmt).option("path", dir).load().count() == 0)
    // …and a non-concurrency failure propagates untouched, unretried
    var ran = 0
    intercept[IllegalArgumentException] {
      DirSink.withDmlRetry() { ran += 1; throw new IllegalArgumentException("x") }
    }
    assert(ran == 1)
  }

  test("vacuum sweeps crashed publishes' tmp debris; the live log survives") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Append).save()
    // a crashed LEGACY publish's tmp manifest, and a crashed log
    // publish's tmp segment — both age-gated vacuum debris
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"${DirSink.ManifestName}.tmp-crashed"),
      "junk".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, graft.sources.v2.DirSinkLog.LogDirName,
        "00000000000000000009.commit.tmp-crashed"),
      "junk".getBytes("UTF-8"))
    val swept = DirSink.vacuum(dir, olderThanMs = 0L)
    assert(swept.contains(s"${DirSink.ManifestName}.tmp-crashed"),
      s"tmp manifest must be swept, got $swept")
    assert(swept.exists(_.endsWith(".commit.tmp-crashed")),
      s"tmp log segment must be swept, got $swept")
    // the live commit log itself is exempt — the zone stays readable
    assert(spark.read.format(fmt).option("path", dir).load().count() == 1)
  }

  test("a stale lock breaks atomically (rename-to-tombstone) and the commit proceeds") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Append).save()
    // a crashed committer's lock, older than the stale threshold
    val lock = java.nio.file.Paths.get(dir, DirSink.LockName)
    java.nio.file.Files.write(lock, "pid=dead".getBytes("UTF-8"))
    val old = System.currentTimeMillis() - 11L * 60 * 1000
    lock.toFile.setLastModified(old)
    // the next committer must break it (never block to timeout) …
    Seq((2L, "b")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Append).save()
    assert(spark.read.format(fmt).option("path", dir).load().count() == 2)
    // … and leave neither the stale lock nor tombstone debris behind
    val left = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith(DirSink.LockName))
    assert(left.isEmpty, s"lock/tombstone debris left behind: ${left.toSeq}")
  }

  test("vacuum never sweeps a LIVE lock; an abandoned one goes") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "v").write.format(fmt)
      .option("path", dir).mode(SaveMode.Append).save()
    val lock = java.nio.file.Paths.get(dir, DirSink.LockName)
    java.nio.file.Files.write(lock, "pid=live".getBytes("UTF-8"))
    // an aggressive retention sweep must not void mutual exclusion: the
    // lock is fresh — its holder is (or may be) mid-commit
    val swept = DirSink.vacuum(dir, olderThanMs = 0L)
    assert(!swept.contains(DirSink.LockName) && lock.toFile.exists(),
      s"vacuum(0) must exempt a live lock, swept $swept")
    // …but an abandoned lock (past the stale threshold) is debris
    lock.toFile.setLastModified(System.currentTimeMillis() - 11L * 60 * 1000)
    val swept2 = DirSink.vacuum(dir, olderThanMs = 0L)
    assert(swept2.contains(DirSink.LockName) && !lock.toFile.exists(),
      s"vacuum must sweep an abandoned lock, swept $swept2")
  }
}

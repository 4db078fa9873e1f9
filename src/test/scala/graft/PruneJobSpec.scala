package graft

import graft.sources.v2.{DirSink, DirSinkLog, DirSinkPrune}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DISTRIBUTED FILE PRUNING over the columnar checkpoint sidecar
  * (sources.v2.DirSinkPrune — metadata as data). The laws:
  *
  *   - EQUIVALENCE: above the threshold the Spark-job prune plans
  *     exactly the files the driver loop plans — same survivors, same
  *     query results — including files added AFTER the checkpoint
  *     (the recent-adds sliver evaluates on the driver);
  *   - FALLBACK: a missing sidecar (its write is failure-tolerant)
  *     degrades to the loop, never to a wrong answer;
  *   - the threshold conf picks the mode, observable via lastMode.
  *
  * The fixture writes enough commits to cross
  * [[DirSinkLog.CheckpointInterval]] so a real checkpoint + sidecar
  * exist, with per-append id clustering so the band predicate has
  * something to prune. */
class PruneJobSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val fmt = "graft.sources.v2.DirSinkSource"

  /** 15 appends, file i covering ids [1000i, 1000i+999]. */
  private def clusteredZone(appends: Int = 15): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    (0 until appends).foreach { i =>
      spark.range(1000L * i, 1000L * i + 1000)
        .select(col("id"), (col("id") * 3).as("v"))
        .coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(if (i == 0) SaveMode.Overwrite else SaveMode.Append).save()
    }
    dir
  }

  private def withThreshold[T](n: Int)(body: => T): T = {
    spark.conf.set(DirSinkPrune.ThresholdKey, n.toString)
    try body finally spark.conf.unset(DirSinkPrune.ThresholdKey)
  }

  private def band(dir: String, lo: Long, hi: Long) =
    spark.read.format(fmt).option("path", dir).load()
      .filter(col("id") >= lo && col("id") < hi)

  test("job prune == loop prune: same survivors, same rows, mode observable") {
    val dir = clusteredZone()
    val (lo, hi) = (7000L, 9000L) // files 7 and 8 of 15
    val loopRows = withThreshold(1000000) {
      val r = band(dir, lo, hi).collect().map(_.getLong(0)).sorted
      assert(DirSinkPrune.lastMode == "loop")
      (r, DirSinkPrune.lastKept)
    }
    val jobRows = withThreshold(1) {
      val r = band(dir, lo, hi).collect().map(_.getLong(0)).sorted
      assert(DirSinkPrune.lastMode == "job",
        "above threshold with a sidecar present the prune must distribute")
      (r, DirSinkPrune.lastKept)
    }
    assert(jobRows._1.toSeq == loopRows._1.toSeq)
    assert(jobRows._1.length == 2000)
    assert(jobRows._2 == loopRows._2,
      s"job kept ${jobRows._2} files, loop kept ${loopRows._2} — the two " +
        "modes must plan the identical file set")
    assert(loopRows._2 < 15, "the band must actually prune")
  }

  test("files added after the checkpoint prune exactly (the recent-adds sliver)") {
    val dir = clusteredZone(12) // checkpoint at gen 10, gen 11 recent
    // three more appends AFTER the last checkpoint: recentAdds nonEmpty
    (12 until 15).foreach { i =>
      spark.range(1000L * i, 1000L * i + 1000)
        .select(col("id"), (col("id") * 3).as("v")).coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(SaveMode.Append).save()
    }
    // a band INSIDE the recent files' range: job mode must still prune
    // to the same survivors the loop finds (1 file of 15)
    val loop = withThreshold(1000000) {
      val r = band(dir, 13000L, 14000L).count()
      (r, DirSinkPrune.lastKept)
    }
    val job = withThreshold(1) {
      val r = band(dir, 13000L, 14000L).count()
      assert(DirSinkPrune.lastMode == "job")
      (r, DirSinkPrune.lastKept)
    }
    assert(job == loop && job._1 == 1000L)
    assert(job._2 <= 2, s"a recent-file band must prune (kept ${job._2})")
    // and a band over OLD (sidecar-covered) files too
    val oldJob = withThreshold(1) {
      val r = band(dir, 2000L, 3000L).count()
      (r, DirSinkPrune.lastKept)
    }
    val oldLoop = withThreshold(1000000) {
      val r = band(dir, 2000L, 3000L).count()
      (r, DirSinkPrune.lastKept)
    }
    assert(oldJob == oldLoop && oldJob._1 == 1000L)
  }

  test("missing sidecar falls back to the loop — never a wrong answer") {
    val dir = clusteredZone()
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val log = DirSinkLog.logPath(dir)
    f.listStatus(log).map(_.getPath)
      .filter(_.getName.endsWith(".checkpoint.parquet"))
      .foreach(p => f.delete(p, false))
    val rows = withThreshold(1) {
      val r = band(dir, 7000L, 9000L).count()
      assert(DirSinkPrune.lastMode == "loop",
        "no sidecar → the job path must decline, not fail")
      r
    }
    assert(rows == 2000L)
  }
}

package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.{Filter, GreaterThan, LessThan}
import org.apache.spark.sql.types.StructType
import graft.sources.v2.{DirSink, DirSinkPrune, DirSinkStats}

/** PLANNING-SCALE PROBE for stats-based file pruning (round-13 verdict
  * task 4's evidence): how does per-plan pruning cost grow with the
  * manifest entry count, driver loop vs the distributed sidecar job
  * ([[graft.sources.v2.DirSinkPrune]])?
  *
  * The probe synthesizes what planning actually consumes — per-file
  * manifest entries with encoded min/max stats (file i covering ids
  * [100i, 100i+99]) and the columnar checkpoint sidecar the commit
  * log writes — at 10^3 / 10^4 / 10^5 entries, then times both prune
  * modes on a selective band predicate (keeps ~1% of files). Data
  * files never exist: pruning is metadata-only, which is the point.
  *
  * Expected shape (and what round-14 measured — see PLANS.md): the
  * loop grows linearly with entries (~µs each, seconds at 10^6
  * extrapolated, per PLAN, inside the driver); the job is flat-ish —
  * fixed ~0.1–0.3 s of scheduling amortized over however many entries
  * the sidecar holds, executor-parallel parse. The crossover sits
  * around the default `spark.graft.prune.jobThreshold` (100k), which
  * is why small zones stay on the loop.
  *
  * Usage: `runMain graft.tools.PruneProbe [maxExp]` (maxExp default 5
  * → up to 10^5 entries).
  */
object PruneProbe {
  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  def main(args: Array[String]): Unit = {
    val maxExp = args.headOption.map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local(appName = "graft-prune-probe")
    import spark.implicits._
    // a REPRESENTATIVE schema width: pruning cost is dominated by the
    // per-file stats decode, which scales with column count — a 2-col
    // toy would understate the driver loop by ~5× vs a real table
    val schema = StructType.fromDDL("id BIGINT, v BIGINT, " +
      (1 to 10).map(j => s"c$j DOUBLE").mkString(", "))
    println("[pruneprobe] entries loop_ms job_ms survivors " +
      "(12-col schema, band keeps ~1% of files)")
    (3 to maxExp).foreach { exp =>
      val n = math.pow(10, exp).toInt
      // file i covers ids [100i, 100i+99]; v spans everything (no
      // help); the 10 filler columns carry real bounds like a
      // production table's would
      def statsOf(i: Int): String =
        s"s=_${b64((100L * i).toString)},${b64((100L * i + 99).toString)};" +
          s"_${b64("0")},${b64("999999999")}" +
          (1 to 10).map(j =>
            s";_${b64((j * 0.25).toString)},${b64((j * 7.5).toString)}")
            .mkString
      val entries = (0 until n).map(i => DirSink.FileEntry(
        s"f$i", 100L, None, Some(statsOf(i).stripPrefix("s=")),
        Some(0L), Some(4096L), None))
      // the band: ~1% of files (ids in [100*(n/2), 100*(n/2 + n/100)))
      val lo = 100L * (n / 2)
      val hi = lo + 100L * math.max(1, n / 100)
      val active: Seq[Filter] =
        Seq(GreaterThan("id", lo - 1), LessThan("id", hi))
      // loop timing (2 passes, report the second — parse-cache-free
      // either way, but JIT warms)
      def loopOnce(): Int = entries.count { e =>
        val st = DirSinkStats.parse(e.stats.get, schema.length)
        !active.exists(f => DirSinkStats.canSkip(f, schema, st))
      }
      loopOnce()
      val t0 = System.nanoTime()
      val kept = loopOnce()
      val loopMs = (System.nanoTime() - t0) / 1e6
      // sidecar: the columnar checkpoint the commit log would have
      // written at a checkpoint generation covering all n entries
      val zone = java.nio.file.Files
        .createTempDirectory(s"graft_pruneprobe_$exp").toString
      val logDir = new Path(zone, "_graft_log")
      val f = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val tmp = new Path(logDir, ".probe-tmp")
      entries.map(e => (e.name, e.rows, e.stats.orNull))
        .toDF("name", "rows", "stats")
        .coalesce(4).write.mode("overwrite").parquet(tmp.toString)
      val gen = 0L
      val sidecar = new Path(logDir, f"$gen%020d.checkpoint.parquet")
      // single-file publish like the log's writer (merge if multi-part:
      // the reader takes a directory too — keep the file shape honest)
      val parts = f.listStatus(tmp).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))
      if (parts.length == 1) { f.rename(parts.head, sidecar); f.delete(tmp, true) }
      else f.rename(tmp, sidecar)
      // job timing (2 passes)
      def jobOnce(): Int = DirSinkPrune.pruneJob(spark, zone, gen,
        Set.empty, entries, schema, active).get.size
      jobOnce()
      val t1 = System.nanoTime()
      val keptJ = jobOnce()
      val jobMs = (System.nanoTime() - t1) / 1e6
      require(kept == keptJ, s"loop/job disagree: $kept vs $keptJ")
      println(f"[pruneprobe] ${n}%7d ${loopMs}%8.1f ${jobMs}%8.1f " +
        f"$kept%6d")
    }
    spark.stop()
  }
}

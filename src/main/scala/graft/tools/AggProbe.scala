package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}
import graft.sources.v2.{DirSink, DirSinkAgg}

/** PLANNING-SCALE PROBE for the metadata-aggregate fold (round-14
  * verdict task 4's evidence) — the [[PruneProbe]] companion: how does
  * the `count(*)/count(c)/min(c)/max(c)` manifest fold cost grow with
  * the entry count, driver loop vs the sidecar job
  * ([[graft.sources.v2.DirSinkAgg]])?
  *
  * Same synthesis as PruneProbe (per-file entries with encoded stats +
  * the columnar checkpoint sidecar, 12-col schema, no data files), with
  * the fold computing all four aggregate shapes over two columns. The
  * expected curve is the prune probe's: the loop linear in entries
  * (per-entry stats decode on the driver), the job flat-ish (fixed
  * scheduling amortized, executor-parallel decode) — the crossover is
  * why both share `spark.graft.prune.jobThreshold`.
  *
  * Usage: `runMain graft.tools.AggProbe [maxExp]` (default 5 → 10^5).
  */
object AggProbe {
  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  def main(args: Array[String]): Unit = {
    val maxExp = args.headOption.map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local(appName = "graft-agg-probe")
    import spark.implicits._
    val schema = StructType.fromDDL("id BIGINT, v BIGINT, " +
      (1 to 10).map(j => s"c$j DOUBLE").mkString(", "))
    val colIdx: IndexedSeq[Int] = IndexedSeq(0, 1) // id, v
    val dts: IndexedSeq[DataType] = colIdx.map(schema(_).dataType)
    println("[aggprobe] entries loop_ms job_ms count min(id) max(id) " +
      "(12-col schema, count/min/max fold)")
    (3 to maxExp).foreach { exp =>
      val n = math.pow(10, exp).toInt
      def statsOf(i: Int): String =
        s"_${b64((100L * i).toString)},${b64((100L * i + 99).toString)};" +
          s"_${b64("0")},${b64("999999999")}" +
          (1 to 10).map(j =>
            s";_${b64((j * 0.25).toString)},${b64((j * 7.5).toString)}")
            .mkString
      val entries = (0 until n).map(i => DirSink.FileEntry(
        s"f$i", 100L, None, Some(statsOf(i)),
        Some(0L), Some(4096L), None))
      // loop timing (2 passes; the second is JIT-warm)
      def loopOnce(): DirSinkAgg.AggFacts =
        entries.foldLeft(DirSinkAgg.empty(colIdx.size))((acc, e) =>
          DirSinkAgg.merge(acc,
            DirSinkAgg.factsOf(e.rows, e.stats, schema.length, colIdx), dts))
      loopOnce()
      val t0 = System.nanoTime()
      val loopFacts = loopOnce()
      val loopMs = (System.nanoTime() - t0) / 1e6
      // the sidecar the commit log would have checkpointed
      val zone = java.nio.file.Files
        .createTempDirectory(s"graft_aggprobe_$exp").toString
      val logDir = new Path(zone, "_graft_log")
      val f = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val tmp = new Path(logDir, ".probe-tmp")
      entries.map(e => (e.name, e.rows, e.stats.orNull))
        .toDF("name", "rows", "stats")
        .coalesce(4).write.mode("overwrite").parquet(tmp.toString)
      val sidecar = new Path(logDir, f"${0L}%020d.checkpoint.parquet")
      val parts = f.listStatus(tmp).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))
      if (parts.length == 1) { f.rename(parts.head, sidecar); f.delete(tmp, true) }
      else f.rename(tmp, sidecar)
      def jobOnce(): DirSinkAgg.AggFacts =
        DirSinkAgg.factsJob(spark, zone, 0L, Set.empty, schema,
          colIdx, dts).get
      jobOnce()
      val t1 = System.nanoTime()
      val jobFacts = jobOnce()
      val jobMs = (System.nanoTime() - t1) / 1e6
      require(loopFacts == jobFacts,
        s"loop/job disagree: $loopFacts vs $jobFacts")
      println(f"[aggprobe] ${n}%7d ${loopMs}%8.1f ${jobMs}%8.1f " +
        f"${loopFacts.rows}%9d ${loopFacts.cols(0).min.get}%7s " +
        f"${loopFacts.cols(0).max.get}%9s")
    }
    spark.stop()
  }
}

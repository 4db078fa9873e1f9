package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.Files

/** Driver-visible run artifact for the streaming surface (ST4/ST5 are
  * proven in FileStreamSpec but a spec leaves no committed evidence):
  * replays the two landing-zone scenarios against the real events
  * parquet — (A) tumbling hourly counts with a 10-day-late drop that
  * the watermark must discard, (B) cross-batch
  * `dropDuplicatesWithinWatermark` over two overlapping drops — and
  * emits ONE JSON document with per-micro-batch input rows, watermark
  * drop counts, and the dedup-hit count, plus a `pass` verdict per
  * scenario. Usage:
  *   runMain graft.streaming.StreamRun <sfDir> [outFile]
  */
object StreamRun {

  private def batchJson(q: StreamingQuery): String =
    q.recentProgress.map { p =>
      val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      val out = Option(p.sink).map(_.numOutputRows).getOrElse(-1L)
      s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""dropped_by_watermark":$dropped,"sink_rows":$out}"""
    }.mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = Tables.load(spark, sfDir, "events")
      .orderBy($"event_id").limit(2000)
      .localCheckpoint(true)

    // ---- scenario A: tumbling counts, one drop 10 days late (ST1+ST4).
    // One part file per drop + maxFilesPerTrigger=1 → one micro-batch
    // per drop, oldest mtime first — how a landing zone actually fills.
    // Spark 4 filters late rows with the PREVIOUS batch's watermark
    // (SPARK-42376), so the late drop lands two batches after the data
    // that advanced it.
    val dirA = Files.createTempDirectory("graft_streamrun_late").toString
    events.filter($"event_id" % 2 === 0)
      .coalesce(1).write.mode("append").parquet(dirA)
    Thread.sleep(1500)
    events.filter($"event_id" % 2 === 1)
      .coalesce(1).write.mode("append").parquet(dirA)
    Thread.sleep(1500)
    events.withColumn("ts", $"ts" - expr("INTERVAL 10 DAYS"))
      .coalesce(1).write.mode("append").parquet(dirA)

    val qA = StreamOps.tumblingCounts(
        spark.readStream.schema(Tables.events)
          .option("maxFilesPerTrigger", "1").parquet(dirA))
      .writeStream.outputMode("append")
      .format("memory").queryName("streamrun_late")
      .trigger(Trigger.AvailableNow())
      .start()
    qA.awaitTermination(180000)
    val sinkA = spark.table("streamrun_late")
    val hourMin = events.select(date_trunc("hour", min($"ts")))
      .head().getTimestamp(0)
    val lateWindows = sinkA.filter($"window_start" < lit(hourMin)).count()
    val lastHour = events
      .select(date_trunc("hour", max($"ts"))).head().getTimestamp(0)
    val expectedA = events
      .filter(date_trunc("hour", $"ts") < lastHour).count()
    val emittedA = sinkA.agg(coalesce(sum($"n"), lit(0L))).as[Long].head()
    val droppedA = qA.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    val batchesA = batchJson(qA)
    qA.stop()
    val passA = lateWindows == 0 && emittedA == expectedA && droppedA > 0

    // ---- scenario B: cross-batch dedup over overlapping drops (ST5).
    // ts pinned to one instant so the scenario isolates DEDUP state
    // (scenario A owns late-arrival semantics).
    val dirB = Files.createTempDirectory("graft_streamrun_dedup").toString
    val pinned = events.limit(800)
      .withColumn("ts", lit("2025-01-01 12:00:00").cast("timestamp"))
      .localCheckpoint(true)
    val ids = pinned.select($"event_id").as[Long].collect().sorted
    val overlap = 300
    pinned.filter($"event_id" <= ids(499)).coalesce(1)
      .write.mode("append").parquet(dirB)
    Thread.sleep(1500)
    pinned.filter($"event_id" >= ids(500 - overlap)).coalesce(1)
      .write.mode("append").parquet(dirB)

    val qB = StreamOps.dedupEvents(
        spark.readStream.schema(Tables.events)
          .option("maxFilesPerTrigger", "1").parquet(dirB))
      .writeStream.outputMode("append")
      .format("memory").queryName("streamrun_dedup")
      .trigger(Trigger.AvailableNow())
      .start()
    qB.awaitTermination(180000)
    val got = spark.table("streamrun_dedup")
      .select($"event_id").as[Long].collect().sorted
    val inputB = 500 + (ids.length - (500 - overlap))
    val dedupHits = inputB - got.length
    val batchesB = batchJson(qB)
    qB.stop()
    val passB = got.length == ids.length && got.toSeq == ids.toSeq &&
      dedupHits == overlap

    val json =
      s"""{"sf":"$sfDir","rows_per_drop":${events.count()},
         |"scenario_late_drop":{"batches":$batchesA,
         |"dropped_by_watermark":$droppedA,"late_windows_emitted":$lateWindows,
         |"on_time_rows_emitted":$emittedA,"expected_on_time_rows":$expectedA,
         |"pass":$passA},
         |"scenario_cross_batch_dedup":{"batches":$batchesB,
         |"input_rows":$inputB,"unique_ids":${ids.length},
         |"emitted":${got.length},"dedup_hits":$dedupHits,
         |"expected_hits":$overlap,"pass":$passB},
         |"pass":${passA && passB}}""".stripMargin.replace("\n", "")
    println(s"[streamrun] $json")
    outFile.foreach { f =>
      Files.write(java.nio.file.Paths.get(f),
        json.getBytes("UTF-8"))
    }
    spark.stop()
    if (!(passA && passB)) sys.exit(1)
  }
}

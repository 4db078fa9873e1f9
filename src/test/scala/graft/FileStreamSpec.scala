package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Production-shaped streaming source: a Parquet DIRECTORY consumed with
  * `readStream` + AvailableNow (the batch-backfill trigger), counted
  * through the tumbling-window transform. Complements the MemoryStream
  * suite with the file-listing source path a 100 TB landing zone uses. */
case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("parquet directory stream processes drops via AvailableNow") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val events = Tables.load(spark, TestSession.sfDir, "events").limit(200)
    // two "drops" landing in the zone
    events.filter($"event_id" < 100).write.mode("append").parquet(dir)
    events.filter($"event_id" >= 100).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(Tables.events)
      .parquet(dir)
    val q = graft.streaming.StreamOps.tumblingCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("filestream")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      // append mode only emits watermark-closed windows; assert the
      // pipeline consumed the files and produced closed hourly windows
      val emitted = spark.table("filestream")
        .agg(sum($"n")).as[Long].head()
      val lastHour = events
        .select(date_trunc("hour", max($"ts")).as("h")).head().getTimestamp(0)
      val expected = events.filter(date_trunc("hour", $"ts") < lastHour).count()
      assert(emitted == expected, s"emitted $emitted, expected $expected")
    } finally q.stop()
  }

  test("ST4 over a file source: late drop discards a drop behind the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_late").toString
    val events = Tables.load(spark, TestSession.sfDir, "events").limit(200)
    // three drops, one part file each so maxFilesPerTrigger=1 gives one
    // micro-batch per drop. Spark 4 filters late events with the
    // PREVIOUS batch's watermark (SPARK-42376: eviction uses the current
    // one), so the late drop must arrive two batches after the data that
    // advanced the watermark — exactly how a real landing zone ingests.
    events.filter($"event_id" % 2 === 0)
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1500) // distinct mtimes: the source lists oldest-first
    events.filter($"event_id" % 2 === 1)
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1500)
    // the late drop: the SAME events shifted 10 days into the past —
    // every row lands far behind the already-committed watermark
    events.withColumn("ts", $"ts" - expr("INTERVAL 10 DAYS"))
      .coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(Tables.events)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = graft.streaming.StreamOps.tumblingCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("latedrop")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val sink = spark.table("latedrop")
      // nothing from the shifted drop: every emitted window must sit in
      // drop 1's time range
      // window starts floor to the hour, so the on-time cutoff is the
      // hour containing the earliest on-time event
      val hourMin = events.select(date_trunc("hour", min($"ts")))
        .head().getTimestamp(0)
      val lateWindows = sink.filter($"window_start" < lit(hourMin)).count()
      // and the state operator must report watermark drops for the late
      // batch (the exact count is post-partial-aggregation GROUPS, not
      // raw rows, so assert presence rather than a brittle number)
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped > 100L,
        s"late drop not filtered by watermark (dropped=$dropped)")
      assert(lateWindows == 0,
        s"$lateWindows window(s) from the late drop survived the watermark")
      // and drop 1's closed windows are all present, exactly once
      val lastHour = events
        .select(date_trunc("hour", max($"ts")).as("h")).head().getTimestamp(0)
      val expected = events.filter(date_trunc("hour", $"ts") < lastHour).count()
      val emitted = sink.agg(coalesce(sum($"n"), lit(0L))).as[Long].head()
      assert(emitted == expected,
        s"emitted $emitted, expected $expected on-time rows")
    } finally q.stop()
  }

  test("ST5 over a file source: dropDuplicatesWithinWatermark dedups across drops") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_dedup").toString
    // pin every ts to one instant: the corpus spans weeks, so raw ts
    // would put most of drop 2 behind the watermark drop 1 advanced —
    // this test is about cross-batch DEDUP state, not late-drop (above)
    val events = Tables.load(spark, TestSession.sfDir, "events")
      .orderBy($"event_id").limit(80)
      .withColumn("ts", lit("2025-01-01 12:00:00").cast("timestamp"))
    // drop 1: event_ids [0, 50); drop 2: [30, 80) — the overlap must be
    // suppressed by the cross-batch dedup state (ids are within the
    // watermark horizon: all ts sit inside one corpus window)
    val ids = events.select($"event_id").as[Long].collect().sorted
    events.filter($"event_id" <= ids(49)).coalesce(1)
      .write.mode("append").parquet(dir)
    Thread.sleep(1500)
    events.filter($"event_id" >= ids(30)).coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(Tables.events)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = graft.streaming.StreamOps.dedupEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("filededup")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val got = spark.table("filededup").select($"event_id").as[Long]
        .collect().sorted
      assert(got.length == 80, s"expected 80 deduped rows, got ${got.length}")
      assert(got.toSeq == ids.toSeq, "every id exactly once, overlap dropped")
    } finally q.stop()
  }

  test("typed Dataset surface: case-class filter/map over lineitem") {
    import spark.implicits._
    val ds = Tables.load(spark, TestSession.sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_returnflag").as[Line]
    val typedCount = ds.filter(_.l_quantity > 25.0)
      .map(l => (l.l_returnflag, l.l_quantity))
      .groupByKey(_._1).count().collect().toMap
    val untyped = Tables.load(spark, TestSession.sfDir, "lineitem")
      .filter($"l_quantity" > 25.0).groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(typedCount == untyped)
  }
}

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

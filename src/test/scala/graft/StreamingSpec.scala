package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** ST1–ST5 streaming execution over MemoryStream (SURVEY.md §5.2.4):
  * window contents, session boundaries, watermark late-row drop, stateful
  * dedup — the semantics not expressible in the batch oracle. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def runStream(name: String, transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: OutputMode)(batches: Seq[Seq[Ev]]): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = transform(mem.toDF())
      .writeStream.outputMode(mode).format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("ST1+ST4: tumbling windows finalize on watermark; late rows dropped") {
    val out = runStream("t1", StreamOps.tumblingCounts, OutputMode.Append())(Seq(
      // window 10:00 gets 2 events; 12:30 advances watermark to 12:20
      Seq(Ev(1, t("10:05"), 1, "click", 1.0), Ev(2, t("10:10"), 1, "click", 1.0),
        Ev(3, t("12:30"), 1, "click", 1.0)),
      // 10:15 is far behind the 12:20 watermark -> dropped;
      // 14:30 advances watermark past window 12:00
      Seq(Ev(4, t("10:15"), 1, "click", 1.0), Ev(5, t("14:30"), 1, "click", 1.0)),
      // flusher: guarantees the 12:00 window is emitted under the 14:20 mark
      Seq(Ev(6, t("16:00"), 1, "click", 1.0))))
    val counts = out.map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    assert(counts("2024-01-01 10:00:00.0") == 2, "late row must NOT be counted")
    assert(counts("2024-01-01 12:00:00.0") == 1)
  }

  test("ST2: sliding windows assign each event to 4 overlapping windows") {
    val out = runStream("t2", StreamOps.slidingCounts, OutputMode.Append())(Seq(
      Seq(Ev(1, t("10:20"), 1, "click", 1.0)),
      Seq(Ev(2, t("14:00"), 1, "click", 1.0)),
      Seq(Ev(3, t("17:00"), 1, "click", 1.0)))) // flusher
    // event 10:20 belongs to windows starting 09:30, 09:45, 10:00, 10:15 —
    // all closed once the watermark reaches 13:50
    val starts = out.filter(_.getLong(2) == 1).map(_.getTimestamp(0).toString).sorted
    assert(starts.count(_.startsWith("2024-01-01 09:")) == 2)
    assert(starts.count(_.startsWith("2024-01-01 10:")) == 2)
  }

  test("ST3: session windows split at >= 30min gaps, end = last + gap") {
    val out = runStream("t3", StreamOps.sessionCounts, OutputMode.Append())(Seq(
      Seq(Ev(1, t("10:00"), 7, "click", 1.0), Ev(2, t("10:10"), 7, "click", 1.0),
        Ev(3, t("10:50"), 7, "click", 1.0)),
      Seq(Ev(4, t("13:00"), 7, "click", 1.0)),   // advances the watermark
      Seq(Ev(5, t("15:00"), 7, "click", 1.0)))) // flusher: emits both sessions
    val sessions = out.map(r =>
      (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(3)))
      .sortBy(_._1)
    // the watermark-advancing events produce their own later sessions;
    // assert on the two sessions under test
    assert(sessions.take(2).toSeq == Seq(
      ("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L),
      ("2024-01-01 10:50:00.0", "2024-01-01 11:20:00.0", 1L)))
  }

  test("stream-stream interval join attributes clicks within 30 minutes") {
    val out = runStream("ssj", StreamOps.purchaseAttribution, OutputMode.Append())(Seq(
      Seq(
        Ev(1, t("10:00"), 7, "click", 1.0),    // within window of p@10:20
        Ev(2, t("09:45"), 7, "click", 1.0),    // 35 min before -> outside
        Ev(3, t("10:10"), 8, "click", 1.0),    // other user
        Ev(4, t("10:20"), 7, "purchase", 9.0)),
      Seq(Ev(5, t("14:00"), 7, "click", 1.0)))) // flusher, advances watermark
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == Seq((4L, 1L)),
      s"expected purchase 4 attributed only to click 1, got ${pairs.toSeq}")
  }

  test("ST9: stream-stream LEFT interval join emits unmatched purchases only after the watermark clears") {
    val out = runStream("sslj", StreamOps.purchaseAttributionLeft,
      OutputMode.Append())(Seq(
      Seq(
        Ev(1, t("10:00"), 7, "click", 1.0),     // within window of p@10:20
        Ev(2, t("10:20"), 7, "purchase", 9.0),  // matched
        Ev(3, t("10:25"), 8, "purchase", 5.0)), // user 8 never clicks
      // flusher 1 advances BOTH sides (the global watermark is the MIN
      // across the two watermark nodes — a click alone leaves the
      // purchase watermark behind and nothing ever releases); its own
      // pair matches inner-style
      Seq(Ev(4, t("14:00"), 7, "click", 1.0),
        Ev(5, t("14:10"), 7, "purchase", 1.0)),
      // flusher 2: outer rows release in the batch AFTER the watermark
      // advance is recorded
      Seq(Ev(6, t("15:00"), 7, "click", 1.0),
        Ev(7, t("15:10"), 7, "purchase", 1.0))))
    val pairs = out.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
    assert(pairs.toSeq == Seq((2L, 1L), (3L, -1L), (5L, 4L), (7L, 6L)),
      s"expected matched (2,1)/(5,4)/(7,6) and watermark-released " +
        s"unmatched (3,null), got ${pairs.toSeq}")
  }

  test("ST8: streaming OHLC bars pick first/last across micro-batches, drop late rows") {
    val out = runStream("ohlc", StreamOps.ohlcBars, OutputMode.Append())(Seq(
      Seq(Ev(1, t("10:01"), 1, "trade", 5.0), Ev(2, t("10:05"), 1, "trade", 9.0)),
      Seq(Ev(3, t("10:14"), 1, "trade", 2.0)),  // same bar, later micro-batch
      Seq(Ev(4, t("11:00"), 1, "trade", 1.0)),  // watermark 10:50 closes 10:00 bar
      Seq(Ev(5, t("10:10"), 1, "trade", 99.0)), // late: behind watermark, dropped
      Seq(Ev(6, t("12:00"), 1, "trade", 3.0)))) // flusher: closes the 11:00 bar
    val bars = out.map(r => r.getTimestamp(0).toString ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6))).toMap
    // open = first by time (5.0), close = last by time (2.0) even though
    // it arrived in a later micro-batch; the late 99.0 never appears
    assert(bars("2024-01-01 10:00:00.0") == ((5.0, 2.0, 2.0, 9.0, 3L)))
    assert(bars("2024-01-01 11:00:00.0") == ((1.0, 1.0, 1.0, 1.0, 1L)))
    assert(!bars.values.exists(b => b._4 == 99.0), "late row must be dropped")
  }

  test("foreachBatch parquet sink lands every micro-batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ck").toString
    val mem = MemoryStream[Ev]
    val q = StreamOps.sinkToParquet(mem.toDF(), out, ckpt)
    try {
      mem.addData(Seq(Ev(1, t("10:00"), 1, "click", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(2, t("10:01"), 1, "click", 2.0),
        Ev(3, t("10:02"), 2, "view", 3.0)))
      q.processAllAvailable()
      val landed = spark.read.parquet(out)
      assert(landed.count() == 3)
      assert(landed.select("batch_id").distinct().count() == 2)
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim into every micro-batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[Ev]
    val q = StreamOps.enrichWithDim(mem.toDF(), dim, "user_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("enrich").start()
    try {
      mem.addData(Seq(Ev(1, t("10:00"), 1, "click", 1.0)))
      q.processAllAvailable()
      // second batch exercises the static side's per-batch reuse
      mem.addData(Seq(Ev(2, t("10:01"), 2, "view", 2.0),
        Ev(3, t("10:02"), 9, "view", 3.0))) // user 9 has no dim row
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .select($"event_id", $"tier").as[(Long, String)].collect().sorted
      assert(rows.toSeq == Seq((1L, "gold"), (2L, "basic")).sortBy(_._1))
    } finally q.stop()
  }

  test("ST5: dropDuplicatesWithinWatermark removes same-id events") {
    val out = runStream("t5", StreamOps.dedupEvents, OutputMode.Append())(Seq(
      Seq(Ev(1, t("10:00"), 1, "click", 1.0), Ev(1, t("10:01"), 1, "click", 1.0),
        Ev(2, t("10:02"), 1, "click", 1.0))))
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream topk: per-window leaders reconcile with the tumbling counts") {
    import spark.implicits._
    val dir = TestSession.sfDir
    val topk = SparkEntry.queries("q_stream_topk")(spark, dir)
      .as[(java.sql.Timestamp, Long, String, Long, Double)]
      .collect().toSeq
    val counts = SparkEntry.queries("q_stream_tumbling")(spark, dir)
      .select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    topk.groupBy(_._1).foreach { case (ws, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size), s"$ws ranks dense")
      val cell = counts.filter(_._1 == ws)
      val nWin = cell.map(_._3).sum
      val want = cell.sortBy { case (_, tpe, n) => (-n, tpe) }
        .take(3).zipWithIndex
        .map { case ((_, tpe, n), i) =>
          (i + 1L, tpe, n, r6(n.toDouble / nWin)) }
      assert(rows.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5)) == want,
        s"$ws leaders")
    }
    assert(topk.map(_._1).distinct.size ==
      counts.map(_._1).distinct.size, "every window has a leader board")
  }
}

package graft

import graft.sources.v2.DirSink
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** TIMESTAMP / DATE through the DirSink table format (round 12):
  * training pipelines carry event time everywhere (crawl time, ingest
  * time, label time), so the landing-zone format must round-trip the
  * temporal types and — since streaming zones are naturally
  * TIME-ORDERED — skip files on time-range predicates. The codec rides
  * the internal integer encodings (micros / epoch days: absolute,
  * timezone-free, ordered); pushed filter values arrive as external
  * java.sql/java.time objects and the stats comparator converts them. */
class TemporalCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val fmt = "graft.sources.v2.DirSinkSource"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_temporal").toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def d(s: String) = java.sql.Date.valueOf(s)

  test("timestamp and date columns round-trip, nulls and sub-second precision included") {
    import spark.implicits._
    val dir = tmpDir()
    val rows = Seq(
      (1L, Some(ts("2026-01-01 10:00:00.123456")), Some(d("2026-01-01"))),
      (2L, Some(ts("2026-06-15 23:59:59.999999")), Some(d("2026-06-15"))),
      (3L, None, None))
    rows.toDF("id", "t", "day").write.format(fmt)
      .option("path", dir).mode(SaveMode.Append).save()
    val back = spark.read.format(fmt).option("path", dir).load()
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Date])]
      .collect().toSeq.sortBy(_._1)
    assert(back == rows, s"got $back")
  }

  test("time-range predicates skip files on a time-ordered zone") {
    import spark.implicits._
    val dir = tmpDir()
    // three month-disjoint files — the shape a streaming ingest leaves
    Seq("2026-01", "2026-02", "2026-03").zipWithIndex.foreach {
      case (m, i) =>
        Seq((i.toLong * 2, ts(s"$m-01 00:00:00"), d(s"$m-01")),
          (i.toLong * 2 + 1, ts(s"$m-28 12:00:00"), d(s"$m-28")))
          .toDF("id", "t", "day").coalesce(1)
          .write.format(fmt).option("path", dir)
          .mode(SaveMode.Append).save()
    }
    def planned(pred: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): (Long, Int) = {
      val df = pred(spark.read.format(fmt).option("path", dir).load())
      val n = df.count()
      val parts = df.rdd.getNumPartitions
      (n, parts)
    }
    // a February timestamp slice must open only the February file
    val (nFeb, pFeb) = planned(_.filter(
      $"t" >= ts("2026-02-01 00:00:00") && $"t" < ts("2026-03-01 00:00:00")))
    assert(nFeb == 2 && pFeb == 1,
      s"timestamp range must plan 1 of 3 files, got $pFeb partitions")
    // a date equality prunes to one file too
    val (nDay, pDay) = planned(_.filter($"day" === d("2026-03-28")))
    assert(nDay == 1 && pDay == 1,
      s"date equality must plan 1 of 3 files, got $pDay partitions")
    // correctness guard: an unpruned read sees everything
    assert(spark.read.format(fmt).option("path", dir).load().count() == 6)
  }
}

package graft

import graft.streaming.{StateInspect, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The statestore / state-metadata readers over a transformWithState
  * checkpoint: streaming state read back as a batch DataFrame. */
class StateInspectSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("state left by a TTL'd transformWithState query reads back " +
      "through the statestore and state-metadata sources") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val lagKey =
      "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag"
    val prevProv = spark.conf.getOption(provKey)
    val prevLag = spark.conf.getOption(lagKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // pin the batch-session caveat: with the lag report off, the read
    // needs no StateStoreCoordinator at all
    spark.conf.set(lagKey, "false")
    val chk = java.nio.file.Files
      .createTempDirectory("graft_stateinspect_chk").toString
    val mem = MemoryStream[(Long, Double)]
    val ttlMs = 600000L
    val t0 = System.currentTimeMillis()
    val q = StreamOps.ttlUserCounts(ttlMs)(mem.toDS())
      .toDF().writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", chk)
      .format("memory").queryName("state_inspect_src").start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("state_inspect_src").count() < n &&
          System.nanoTime() < deadline)
        Thread.sleep(100)
    }
    try {
      mem.addData(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)))
      awaitRows(2)
      mem.addData(Seq((1L, 4.0), (3L, 9.0)))
      awaitRows(4)
    } finally q.stop()

    // catalog: one transformWithState operator declaring all three
    // state variables with the right TTL flags
    val meta = StateInspect.stateMetadata(spark, chk).collect()
    assert(meta.length == 1)
    val row = meta.head
    assert(row.getAs[String]("operatorName") == "transformWithStateExec")
    val props = row.getAs[String]("operatorProperties")
    assert(props.contains(
      """{"stateName":"totalCount","stateVariableType":"ValueState","ttlEnabled":false}"""))
    assert(props.contains(
      """{"stateName":"recentCount","stateVariableType":"ValueState","ttlEnabled":true}"""))

    // the no-TTL handle: final accumulated counts, no expiry column
    val total = StateInspect.longValueState(spark, chk, "totalCount")
      .as[(Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(total == Seq((1L, 3L, None), (2L, 1L, None), (3L, 1L, None)))

    // the TTL'd handle: same final values, expiry ≈ last update + TTL
    val recent = StateInspect.longValueState(spark, chk, "recentCount")
      .as[(Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(recent.map(r => (r._1, r._2)) ==
      Seq((1L, 3L), (2L, 1L), (3L, 1L)))
    recent.foreach { case (_, _, exp) =>
      assert(exp.isDefined)
      assert(exp.get > t0 && exp.get <= System.currentTimeMillis() + ttlMs)
    }

    // the store reads as one input partition per state shard — the
    // property that makes offline inspection executor-parallel at scale
    val parts = StateInspect.valueState(spark, chk, "totalCount")
      .rdd.getNumPartitions
    assert(parts ==
      spark.sessionState.conf.getConfString(
        "spark.sql.shuffle.partitions").toInt)

    prevProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
    prevLag match {
      case Some(v) => spark.conf.set(lagKey, v)
      case None => spark.conf.unset(lagKey)
    }
  }
}

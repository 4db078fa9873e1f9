package graft

import graft.operators.Skew
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join equivalence + custom flatMapGroupsWithState state. */
class SkewStateSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("salted join == plain join on a skewed fact table") {
    import spark.implicits._
    // 90% of fact rows hit key 1 (the hot key)
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 1 else i % 7 + 2, i.toLong, i * 2.0))
      .toDF("k", "row_id", "v")
    val dim = (1 to 10).map(i => (i, s"dim_$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select($"row_id", $"name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", "row_id", buckets = 8)
      .select($"row_id", $"name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 1000 - fact.filter($"k" > 10).count())
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = StreamOps.runningUserStats(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stats").start()
    try {
      mem.addData(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)))
      q.processAllAvailable()
      mem.addData(Seq((1L, 4.0)))
      q.processAllAvailable()
      val rows = spark.table("stats").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // batch 1 emits (1, 2, 3.0) and (2, 1, 5.0); batch 2 emits (1, 3, 7.0)
      assert(rows.toSet == Set((1L, 2L, 3.0), (2L, 1L, 5.0), (1L, 3L, 7.0)))
    } finally q.stop()
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    // 95% of fact rows hit one key; thresholds lowered so the skew logic
    // triggers at test scale (at 100 TB the defaults do the same job)
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = (1 to 20000).map(i =>
        (if (i <= 19000) 1 else i % 64 + 2, s"payload_$i"))
        .toDF("k", "payload")
      val dim = (1 to 128).map(i => (i, s"dim_$i")).toDF("k", "name")
      val joined = fact.join(dim, Seq("k"))
      // execute THIS plan (a .count() builds a different QueryExecution,
      // leaving this one isFinalPlan=false) so AQE re-plans it for real
      assert(joined.collect().length ==
        20000 - fact.filter($"k" > 128).count())
      val finalPlan = joined.queryExecution.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n${finalPlan.take(600)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("transformWithState emits the same rows as flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // transformWithState requires the RocksDB state store provider;
    // scope it to this query and restore the default afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Double)]
    val q = StreamOps.runningUserStatsTws(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stats_tws").start()
    try {
      mem.addData(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)))
      q.processAllAvailable()
      mem.addData(Seq((1L, 4.0)))
      q.processAllAvailable()
      val rows = spark.table("stats_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // identical emission contract to the flatMapGroupsWithState form
      assert(rows.toSet == Set((1L, 2L, 3.0), (2L, 1L, 5.0), (1L, 3L, 7.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("ttlUserCounts: both named ValueStates accumulate across batches " +
      "while the TTL has not lapsed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Double)]
    // generous TTL: in-suite the point is the two-handle accumulation
    // contract; REAL expiry (restart + lapsed TTL → recent resets while
    // total persists) is exercised end-to-end by StreamRun scenario C
    // and committed as STREAM_r10.json
    val q = StreamOps.ttlUserCounts(ttlMs = 600000L)(mem.toDS())
      .toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ttl_counts").start()
    // processing-time mode keeps scheduling no-data batches (pending
    // TTL could still fire), so processAllAvailable never returns —
    // poll the sink for the expected emission count instead
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("ttl_counts").count() < n &&
          System.nanoTime() < deadline)
        Thread.sleep(100)
    }
    try {
      mem.addData(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)))
      awaitRows(2)
      mem.addData(Seq((1L, 4.0), (3L, 9.0)))
      awaitRows(4)
      val rows = spark.table("ttl_counts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(
        (1L, 2L, 2L), (2L, 1L, 1L),   // batch 1: fresh on both handles
        (1L, 3L, 3L), (3L, 1L, 1L)))  // batch 2: user 1 accumulated
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

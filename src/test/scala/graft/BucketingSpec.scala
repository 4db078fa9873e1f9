package graft

import graft.sources.Tables
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing (SURVEY.md "Partitioning & shuffle"): pre-bucketing both
  * sides of a recurring fact⋈fact join on the join key removes the
  * per-query shuffle — THE join strategy for repeated 100 TB joins.
  * Asserts the bucketed join plan contains no ShuffleExchange upstream of
  * the join, and matches the plain join's results. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("bucketed fact-fact join runs without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, TestSession.sfDir, "lineitem")
      val o = Tables.load(spark, TestSession.sfDir, "orders")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the only allowed exchange is the one for the final groupBy —
      // the join itself must consume bucketed scans directly
      assert(shuffles.size <= 1, s"join shuffled: ${shuffles.size} exchanges")
      val expected = Tables.load(spark, TestSession.sfDir, "lineitem")
        .join(Tables.load(spark, TestSession.sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted.toSeq
      assert(joined.collect().map(_.toString).sorted.toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}

package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV TypedImperativeAggregate: exactness below k, estimation accuracy
  * above k, and partition invariance (merge correctness). */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("exact below k; within 30% above k; partition-invariant") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = (1 to 5000).map(i => (if (i % 10 == 0) "big" else "small",
      if (i % 10 == 0) i.toLong else (i % 40).toLong))
      .toDF("g", "v")
    def run(parts: Int): Map[String, (Double, Long)] = df.repartition(parts)
      .groupBy($"g").agg(VectorFunctions.kmvDistinct($"v").as("kmv"),
        countDistinct($"v").as("exact"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val r1 = run(2)
    val r13 = run(13)
    assert(r1 == r13, "estimate must not depend on partitioning")
    val (smallKmv, smallExact) = r1("small")
    assert(smallKmv == smallExact.toDouble, "below k the sketch is exact")
    val (bigKmv, bigExact) = r1("big")
    assert(math.abs(bigKmv - bigExact) / bigExact < 0.30,
      s"kmv=$bigKmv exact=$bigExact")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws over generated data (SURVEY.md §5.2.3), checked
  * column-wise on one generated DataFrame per law (fast — one job, many
  * samples) rather than one job per ScalaCheck case. */
class AlgebraicLawsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def genRows(n: Int): Seq[(Long, Long, Double, String)] = {
    val g = for {
      k <- Gen.choose(0L, 50L)
      v <- Gen.choose(-1000L, 1000L)
      d <- Gen.choose(-10.0, 10.0)
      s <- Gen.alphaLowerStr.map(_.take(6))
    } yield (k, v, d, s)
    Gen.listOfN(n, g).sample.get
  }

  test("filter commutes with projection") {
    import spark.implicits._
    val df = genRows(500).toDF("k", "v", "d", "s").repartition(4)
    val a = df.filter($"v" > 0).select($"k", $"v")
    val b = df.select($"k", $"v").filter($"v" > 0)
    assert(a.collect().map(_.toString).sorted.toSeq ==
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("union row-count additivity and unionByName column safety") {
    import spark.implicits._
    val x = genRows(300).toDF("k", "v", "d", "s")
    val y = genRows(200).toDF("k", "v", "d", "s")
    assert(x.unionByName(y).count() == x.count() + y.count())
    // column order must not matter for unionByName
    val yShuffled = y.select($"s", $"d", $"v", $"k")
    assert(x.unionByName(yShuffled).count() == 500)
  }

  test("intersect/except partition distinct rows") {
    import spark.implicits._
    val x = genRows(400).toDF("k", "v", "d", "s").select($"k")
    val y = genRows(400).toDF("k", "v", "d", "s").select($"k")
    val inter = x.intersect(y).count()
    val minus = x.except(y).count()
    assert(inter + minus == x.distinct().count())
  }

  test("groupBy sum is partition-count invariant") {
    import spark.implicits._
    val rows = genRows(500)
    def agg(parts: Int) = rows.toDF("k", "v", "d", "s").repartition(parts)
      .groupBy($"k").agg(sum($"v").as("sv")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(agg(1) == agg(7))
  }

  test("dedup by key is idempotent and order-stable under reshuffling") {
    import spark.implicits._
    val df = genRows(500).toDF("k", "v", "d", "s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"v", $"d", $"s")
    def dedup(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    val once = dedup(df).collect().map(_.toString).sorted.toSeq
    val twice = dedup(dedup(df)).collect().map(_.toString).sorted.toSeq
    val reshuffled = dedup(df.repartition(11)).collect().map(_.toString).sorted.toSeq
    assert(once == twice && once == reshuffled)
  }
}

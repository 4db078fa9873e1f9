package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound laws for the engine-specific sketches that are declared
  * WITHOUT a DuckDB oracle (q_agg_cms, q_agg_approx_percentile — the A4
  * precedent): the hash gate can't check them, so these specs pin the
  * sketch guarantees against exact replays. Both sketches are seeded/
  * deterministic, so the assertions are stable, not probabilistic. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("cms estimates bracket exact counts: exact <= est <= exact + eps*N") {
    import spark.implicits._
    val toks = graft.sources.Tables.load(spark, dir, "documents")
      .select(explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") > 0)
    val exact = toks.groupBy($"tok").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val est = SparkEntry.queries("q_agg_cms")(spark, dir)
      .as[(String, Long)].collect()
    assert(est.length == 8)
    est.foreach { case (tok, e) =>
      val x = exact.getOrElse(tok, 0L)
      assert(e >= x, s"CMS underestimated '$tok': $e < $x")
      assert(e <= x + (0.001 * n).ceil.toLong,
        s"CMS blew the eps*N bound for '$tok': $e > $x + 0.001*$n")
    }
    // the absent probe proves estimates are one-sided, not lookups
    assert(exact.get("absent_token").isEmpty)
  }

  test("approx percentile lands within rank tolerance of the exact order stats") {
    import spark.implicits._
    val byType = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"value")
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sorted }
    val got = SparkEntry.queries("q_agg_approx_percentile")(spark, dir)
      .as[(String, Double, Double)].collect()
    assert(got.length == byType.size)
    got.foreach { case (t, p50, p95) =>
      val xs = byType(t)
      val n = xs.length
      val tol = n / 10000 + 1
      def ok(p: Double, est: Double): Boolean = {
        val r = math.ceil(p * n).toInt - 1
        val lo = xs(math.max(0, r - tol))
        val hi = xs(math.min(n - 1, r + tol))
        est >= lo && est <= hi
      }
      assert(ok(0.50, p50), s"p50 out of rank band for $t")
      assert(ok(0.95, p95), s"p95 out of rank band for $t")
    }
  }
}

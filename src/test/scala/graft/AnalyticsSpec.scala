package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural laws for the warehouse-analytics module — properties the
  * DuckDB hash gate can't express (it only proves Spark ≡ DuckDB, not
  * that either is RIGHT). */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("cohort retention: month-0 is full, ratios in (0,1], sizes partition customers") {
    import spark.implicits._
    val rows = q("q_retention_cohort")
      .select($"cohort_month".cast("string"), $"months_since",
        $"n_active", $"cohort_size", $"retention")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.values.foreach { cells =>
      val m0 = cells.filter(_._2 == 0L)
      assert(m0.length == 1, "every cohort has exactly one month-0 cell")
      assert(m0.head._3 == m0.head._4,
        "month-0 active count must equal cohort size (first order IS activity)")
      cells.foreach { case (_, _, a, sz, r) =>
        assert(a >= 1 && a <= sz && r > 0.0 && r <= 1.0)
      }
    }
    val custs = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_custkey").distinct().count()
    assert(byCohort.values.map(_.head._4).sum == custs,
      "cohort sizes must partition the distinct customer set")
  }

  test("range frame: rolling 30-day sum matches a brute-force replay per customer") {
    import spark.implicits._
    val got = q("q_window_range")
      .as[(Long, Long, Long, Double, Long)].collect()
    val base = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_custkey",
        datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
          .cast("long"),
        $"o_totalprice")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    got.groupBy(_._2).foreach { case (cust, rows) =>
      val hist = base(cust)
      rows.foreach { case (_, _, day, rev, n) =>
        val in = hist.filter(h => h._2 >= day - 29 && h._2 <= day)
        assert(in.length == n, s"cust $cust day $day count")
        val want = in.map(h => BigDecimal(h._3).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        assert(math.abs(want - rev) < 1e-6, s"cust $cust day $day sum")
      }
    }
  }

  test("scd2: dense versions, ordered intervals, one open row per user, no self-transitions") {
    import spark.implicits._
    val rows = q("q_scd2")
      .as[(Long, Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (u, rs) =>
      val s = rs.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1L to s.length).toSeq, s"user $u versions")
      assert(s.count(_._5.isEmpty) == 1 && s.last._5.isEmpty,
        s"user $u must have exactly one open (current) interval, the last")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, s"user $u consecutive types must differ")
          assert(a._5.contains(b._4),
            s"user $u intervals must chain: valid_to == next valid_from")
          assert(!b._4.before(a._4), s"user $u interval order")
        case _ =>
      }
    }
  }

  test("outliers: flagged set is exactly the brute-force 2-sigma tail") {
    import spark.implicits._
    val got = q("q_outliers").select($"event_id").as[Long].collect().toSet
    val base = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val want = base.groupBy(_._2).iterator.flatMap { case (_, es) =>
      val xs = es.map(e => math.floor(e._3 * 10000.0 + 0.5))
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => x * x).sum / n - mean * mean)
      es.zip(xs).filter { case (_, x) => math.abs((x - mean) / sd) > 2.0 }
        .map(_._1._1)
    }.toSet
    assert(got == want, "z-score tail must match the naive replica")
    assert(got.nonEmpty, "testdata must produce a non-empty tail")
  }
}

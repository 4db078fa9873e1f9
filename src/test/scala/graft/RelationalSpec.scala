package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable assertions per operator family on sf0.001
  * (SURVEY.md §5.2.2) + algebraic laws (§5.2.3). */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("every declared query executes and yields a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle key has a matching declared query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("no query name collides across modules (Map concat would shadow)") {
    // Derived from the registry itself so a new module can never make
    // this guard stale (round-4 lesson: a hand-copied list missed MlOps).
    val perModule = SparkEntry.modules.map(_.queries.size).sum
    assert(SparkEntry.queries.size == perModule,
      s"collision: ${perModule - SparkEntry.queries.size} shadowed keys")
  }

  test("q_join_chain covers all regions with positive revenue") {
    import spark.implicits._
    val rows = q("q_join_chain").as[(String, Double, Long)].collect()
    assert(rows.length == 5)
    assert(rows.forall { case (_, rev, n) => rev > 0 && n > 0 })
  }

  test("q_sort_limit returns 10 orders in descending totalprice") {
    import spark.implicits._
    val rows = q("q_sort_limit").select($"o_totalprice").as[Double].collect()
    assert(rows.length == 10)
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }

  test("semi + anti partition customers") {
    val semi = q("q_join_semi").count()
    val total = graft.sources.Tables.load(spark, dir, "customer").count()
    import spark.implicits._
    val f = graft.sources.Tables.load(spark, dir, "orders")
      .filter($"o_orderstatus" === "F")
    val anti = graft.sources.Tables.load(spark, dir, "customer")
      .join(f, $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(semi + anti == total)
  }

  test("rollup row count = detail + region subtotals + grand total") {
    val nations = q("q_rollup")
    import spark.implicits._
    val detail = nations.filter($"nation_name" =!= "ALL").count()
    val regionTotals = nations
      .filter($"nation_name" === "ALL" && $"region_name" =!= "ALL").count()
    val grand = nations
      .filter($"region_name" === "ALL" && $"nation_name" === "ALL").count()
    assert(regionTotals == 5 && grand == 1)
    assert(nations.count() == detail + regionTotals + grand)
  }

  test("union is additive, except removes, intersect bounds") {
    import spark.implicits._
    val e = graft.sources.Tables.load(spark, dir, "events")
    val a = e.filter($"event_type" === "signup").count()
    val b = e.filter($"event_type" === "purchase").count()
    assert(q("q_union").count() == a + b)
    val nNation = graft.sources.Tables.load(spark, dir, "nation")
      .select("n_nationkey").distinct().count()
    assert(q("q_intersect").count() + q("q_except").count() == nNation)
  }

  test("as-of join: signup_ts <= purchase ts, and is the max such signup") {
    import spark.implicits._
    val rows = q("q_join_asof")
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, ts, su) => su.forall(!_.after(ts)) })
    // cross-check one user against a direct computation
    val e = graft.sources.Tables.load(spark, dir, "events")
    val (pid, uid, pts, sut) = rows.maxBy(_._1)
    val expect = e.filter($"event_type" === "signup" && $"user_id" === uid &&
        $"ts" <= lit(pts)).agg(max($"ts")).as[Option[java.sql.Timestamp]]
      .head()
    assert(sut == expect, s"purchase $pid user $uid")
  }

  test("gap-fill LOCF: filled value is constant across gaps, null before first obs") {
    import spark.implicits._
    val rows = q("q_gapfill_locf")
      .select($"custkey", $"month".cast("string"), $"rev_filled", $"is_gap")
      .as[(Long, String, Option[Double], Boolean)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.values.foreach { series =>
      val s = series.sortBy(_._2)
      // same scaffold for every entity: full month range
      assert(s.length == rows.values.head.length)
      s.foldLeft(Option.empty[Double]) { case (prev, (_, _, filled, isGap)) =>
        if (isGap) assert(filled == prev, "gap row must carry previous value")
        else assert(filled.isDefined, "observation row must be non-null")
        filled
      }
    }
  }

  test("histogram buckets partition the table and bound their contents") {
    import spark.implicits._
    val h = q("q_histogram")
      .as[(Long, Double, Double, Long, Double, Double, Double)].collect()
    val total = graft.sources.Tables.load(spark, dir, "lineitem").count()
    assert(h.map(_._4).sum == total, "buckets must partition all rows")
    h.foreach { case (b, lo, hi, n, mn, mx, sum) =>
      assert(lo == b * 10000.0 && hi == lo + 10000.0)
      assert(mn >= lo - 1e-6 && mx < hi + 1e-6 && mn <= mx)
      assert(sum >= n * mn - 1e-3 && sum <= n * mx + 1e-3)
    }
  }

  test("mode is the true argmax of per-value counts with smallest-value ties") {
    import spark.implicits._
    val got = q("q_agg_mode")
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val counts = graft.sources.Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_quantity").count()
      .as[(String, Double, Long)].collect()
      .groupBy(_._1)
    counts.foreach { case (flag, vs) =>
      val best = vs.map { case (_, q, c) => (c, q) }
        .sortBy { case (c, q) => (-c, q) }.head
      assert(got(flag) == ((best._2, best._1)), s"flag $flag")
    }
  }

  test("shipping priority: top-10 matches a brute-force replay of TPC-H Q3") {
    import spark.implicits._
    val got = q("q_shipping_priority")
      .select($"l_orderkey", $"revenue").as[(Long, Double)].collect()
    assert(got.length == 10)
    val cutoff = java.sql.Timestamp.valueOf("1998-06-01 00:00:00")
    val building = graft.sources.Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").as[Long].collect().toSet
    val ords = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(o => o._3.before(cutoff) && building(o._2)).map(_._1).toSet
    val want = graft.sources.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount", $"l_shipdate")
      .as[(Long, Double, Double, java.sql.Timestamp)].collect()
      .filter(l => l._4.after(cutoff) && ords(l._1))
      .groupBy(_._1)
      .map { case (k, ls) =>
        // replay the DECIMAL(18,4) quantized fold exactly
        val rev = ls.map { case (_, p, d, _) =>
          BigDecimal(p * (1.0 - d)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        (k, rev.toDouble)
      }.toSeq.sortBy { case (k, r) => (-r, k) }.take(10)
    assert(got.toSeq == want, "top-10 revenue orders diverge from replay")
  }

  test("asOfJoin helper matches inequality-join semantics on crafted data") {
    import spark.implicits._
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val left = Seq((1L, t(10), "p1"), (1L, t(30), "p2"), (2L, t(5), "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, t(10), 100.0), (1L, t(20), 200.0), (2L, t(6), 300.0))
      .toDF("user_id", "ts", "v")
    val got = graft.operators.AsOf
      .asOfJoin(left, right, "user_id", "ts", "v", "asof_v")
      .select($"tag", $"asof_v").as[(String, Option[Double])]
      .collect().toMap
    // p1: right row at the SAME ts is visible (<=); p3: none at or before
    assert(got == Map("p1" -> Some(100.0), "p2" -> Some(200.0), "p3" -> None))
    // tolerance: p2's match at t(20) is 10 min old — a 5-min tolerance
    // discards it, a 15-min tolerance keeps it
    val tight = graft.operators.AsOf
      .asOfJoin(left, right, "user_id", "ts", "v", "asof_v",
        toleranceMicros = Some(5L * 60 * 1000000))
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect().toMap
    assert(tight == Map("p1" -> Some(100.0), "p2" -> None, "p3" -> None))
    val loose = graft.operators.AsOf
      .asOfJoin(left, right, "user_id", "ts", "v", "asof_v",
        toleranceMicros = Some(15L * 60 * 1000000))
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect().toMap
    assert(loose == got)
  }
}

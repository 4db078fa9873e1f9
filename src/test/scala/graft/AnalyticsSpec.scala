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

  test("gini: per-nation concentration matches an exact rank-sum replica") {
    import spark.implicits._
    val got = q("q_gini").as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val rev = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => BigDecimal(r._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum)
      .mapValues(d => (d * 10000).toLongExact).toMap
    val natOf = {
      val nn = graft.sources.Tables.load(spark, dir, "nation")
        .select($"n_nationkey", $"n_name").as[(Int, String)].collect().toMap
      graft.sources.Tables.load(spark, dir, "customer")
        .select($"c_custkey", $"c_nationkey").as[(Long, Int)].collect()
        .map { case (c, k) => c -> nn(k) }.toMap
    }
    val byNat = rev.toSeq.map { case (c, r) => (natOf(c), c, r) }
      .groupBy(_._1)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (nat, nCust, totalRev, gini) =>
      val xs = byNat(nat).sortBy(d => (d._3, d._2)).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      assert(nCust == n, s"$nat count")
      assert(totalRev == r6(sx.toDouble / 10000.0), s"$nat revenue")
      val want = r6((2.0 * six.toDouble) / (n.toDouble * sx.toDouble) -
        (n + 1).toDouble / n.toDouble)
      assert(gini == want, s"$nat gini")
      assert(gini >= 0.0 && gini < 1.0, s"$nat gini bounds")
    }
    assert(got.map(_._1).sameElements(got.map(_._1).sorted))
  }

  test("period growth: month-over-month deltas match a decimal replica") {
    import spark.implicits._
    val got = q("q_period_growth")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .collect()
    assert(got.nonEmpty)
    val rows = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_orderpriority", year($"o_orderdate") * 12
        + month($"o_orderdate") - 1, $"o_totalprice")
      .as[(String, Int, Double)].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val cells = rows.groupBy(r => (r._1, r._2.toLong)).view.mapValues { rs =>
      (rs.length.toLong, rs.map(r => BigDecimal(r._3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    }.toMap
    // per priority the output is month-ordered and growth chains revenues
    got.groupBy(_._1).foreach { case (prio, series) =>
      val s = series.sortBy(_._2)
      assert(s.map(_._2).sameElements(series.map(_._2)), s"$prio order")
      s.zipWithIndex.foreach { case ((_, m, n, rev, prev, growth), i) =>
        val (wn, wrev) = cells((prio, m))
        assert(n == wn && rev == wrev, s"$prio/$m cell")
        if (i == 0) assert(prev.isEmpty && growth.isEmpty, s"$prio head")
        else {
          val p = s(i - 1)._4
          assert(prev.contains(p), s"$prio/$m prev")
          assert(growth.contains(r6((rev - p) / p)), s"$prio/$m growth")
        }
      }
    }
  }

  test("seasonality: hour profile matches an exact quantized replica") {
    import spark.implicits._
    val got = q("q_seasonality")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == 120, "5 types x 24 hours")
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", hour($"ts").cast("long"), $"value")
      .as[(String, Long, Double)].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val byCell = rows.groupBy(r => (r._1, r._2))
    val byType = rows.groupBy(_._1)
    got.foreach { case (t, hod, n, mean, ratio) =>
      val cell = byCell((t, hod))
      assert(n == cell.length, s"($t,$hod) n")
      val sv = cell.map(r => math.floor(r._3 * 10000.0 + 0.5).toLong).sum
      val wMean = sv.toDouble / (n.toDouble * 10000.0)
      assert(mean == r6(wMean), s"($t,$hod) mean")
      val all = byType(t)
      val tsv = all.map(r => math.floor(r._3 * 10000.0 + 0.5).toLong).sum
      val tMean = tsv.toDouble / (all.length.toDouble * 10000.0)
      assert(ratio == r6(wMean / tMean), s"($t,$hod) ratio")
    }
    // profile sanity: per type, the weighted hour means average to the
    // type mean, so ratios bracket 1
    byType.keys.foreach { t =>
      val rs = got.filter(_._1 == t).map(_._5)
      assert(rs.min <= 1.0 + 1e-6 && rs.max >= 1.0 - 1e-6, s"$t ratios")
    }
  }

  test("linreg trend: slope/intercept/r2 match an exact BigInt replica") {
    import spark.implicits._
    val got = q("q_linreg_trend")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == 5)
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"value")
      .as[(String, Long, Double)].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (t, nObs, slope, intercept, r2) =>
      val xs = rows.filter(_._1 == t).map { case (_, tus, v) =>
        (BigInt(tus / 1000000L - 1704067200L),
          BigInt(math.floor(v * 10000.0 + 0.5).toLong))
      }
      assert(nObs == xs.length, s"$t n")
      val n = BigInt(xs.length)
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val syy = xs.map(p => p._2 * p._2).sum
      val cov = (n * sxy - sx * sy).toDouble
      val varx = (n * sxx - sx * sx).toDouble
      val vary = (n * syy - sy * sy).toDouble
      val wSlope = cov / varx / 10000.0
      assert(slope == r6(wSlope), s"$t slope")
      assert(intercept == r6(sy.toDouble / (n.toDouble * 10000.0)
        - wSlope * (sx.toDouble / n.toDouble)), s"$t intercept")
      assert(r2 == r6(cov * cov / (varx * vary)), s"$t r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"$t r2 out of range")
    }
  }

  test("changepoint cusum: peak index and statistic match brute force") {
    import spark.implicits._
    val got = q("q_changepoint_cusum")
      .as[(String, Int, Long, Long, Double)].collect()
    assert(got.length == 5)
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"event_id", unix_micros($"ts"), $"value")
      .as[(String, Long, Long, Double)].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (t, cpIdx, cpTus, nObs, stat) =>
      val series = rows.filter(_._1 == t).sortBy(e => (e._3, e._2))
        .map(e => (e._3, BigInt(math.floor(e._4 * 10000.0 + 0.5).toLong)))
      val n = BigInt(series.length)
      val sv = series.map(_._2).sum
      var cum = BigInt(0)
      val ds = series.zipWithIndex.map { case ((tus, vq), i0) =>
        cum += vq
        (i0 + 1, tus, (n * cum - BigInt(i0 + 1) * sv).abs)
      }
      val mx = ds.map(_._3).max
      val peak = ds.filter(_._3 == mx).minBy(_._1)
      assert(nObs == series.length, s"$t n")
      assert(cpIdx == peak._1, s"$t index")
      assert(cpTus == peak._2, s"$t ts")
      assert(stat == r6(mx.toDouble / (n.toDouble * 10000.0)), s"$t stat")
    }
  }

  test("market basket: support and lift match brute-force pair counting") {
    import spark.implicits._
    val got = q("q_market_basket")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val items = graft.sources.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val freq = items.groupBy(_._2).view.mapValues(_.length.toLong)
      .filter(_._2 >= 2L).toMap
    val nBaskets = items.map(_._1).distinct.length.toLong
    val want = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).filter(freq.contains).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.map(g => (g._1, g._2)).toSet == want.keySet, "pair set")
    got.foreach { case (a, b, sup, lift) =>
      assert(sup == want((a, b)), s"($a,$b) support")
      assert(lift == r6(nBaskets.toDouble * sup.toDouble
        / (freq(a).toDouble * freq(b).toDouble)), s"($a,$b) lift")
    }
    // ordering: support desc, then pair
    val key = got.map(g => (-g._3, g._1, g._2))
    assert(key.sameElements(key.sorted), "output ordering")
  }

  test("ri audit: one row per FK edge, clean star schema, metrics consistent") {
    import spark.implicits._
    val got = q("q_ri_audit")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 7, "one row per declared FK edge")
    assert(got.map(_._1).sorted.sameElements(got.map(_._1)), "ordered by name")
    got.foreach { case (name, rows, nulls, distinct, okeys, orows) =>
      assert(rows > 0, s"$name: empty child")
      // the synthetic star schema is referentially clean
      assert(nulls == 0 && okeys == 0 && orows == 0, s"$name: dirty")
      assert(distinct <= rows, s"$name: distinct exceeds rows")
    }
    // cross-check one edge against direct aggregates
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val row = got.find(_._1 == "lineitem.l_orderkey->orders").get
    assert(row._2 == li.count())
    assert(row._4 == li.select($"l_orderkey").distinct().count())
  }

  test("ri audit: orphans and null FKs are counted, keys and rows separately") {
    import spark.implicits._
    // a deliberately dirty child against the real region parent: two rows
    // of a known-good key, three rows across two orphan keys, two NULLs
    val dirty = Seq(Option(0), Option(0), Option(777), Option(777),
      Option(888), None, None).toDF("fk")
    val keyed = dirty.groupBy($"fk").agg(count(lit(1)).as("rows"))
    val parent = graft.sources.Tables.load(spark, dir, "region")
      .select($"r_regionkey".as("pk"))
    val orphans = keyed.filter($"fk".isNotNull)
      .join(parent, $"fk" === $"pk", "left_anti")
      .agg(count(lit(1)).as("ok"), coalesce(sum($"rows"), lit(0L)).as("or"))
      .as[(Long, Long)].head()
    assert(orphans == ((2L, 3L)), "2 orphan keys carrying 3 orphan rows")
    val nulls = keyed.agg(
      coalesce(sum(when($"fk".isNull, $"rows")), lit(0L)))
      .as[Long].head()
    assert(nulls == 2L)
  }

  test("anomaly mad: median, MAD, and flags match an exact Scala replica") {
    import spark.implicits._
    val got = q("q_anomaly_mad")
      .select($"event_id", $"event_type", $"median", $"mad_score",
        $"is_anomaly")
      .as[(Long, String, Double, Option[Double], Boolean)].collect()
    assert(got.nonEmpty)
    val byType = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
      .groupBy(_._2)
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((xs.length + 1) / 2 - 1) // ceil(n/2)-th, 1-based -> 0-based
    }
    val stats = byType.map { case (t, rows) =>
      val xq = rows.map(r => math.floor(r._3 * 10000.0 + 0.5).toLong)
      val med = lowerMedian(xq)
      val mad = lowerMedian(xq.map(x => math.abs(x - med)))
      t -> (med, mad)
    }
    val xqOf = byType.values.flatten
      .map(r => r._1 -> math.floor(r._3 * 10000.0 + 0.5).toLong).toMap
    got.foreach { case (id, t, median, score, flag) =>
      val (med, mad) = stats(t)
      assert(median == med.toDouble / 10000.0, s"event $id median")
      val dev = math.abs(xqOf(id) - med)
      if (mad > 0) {
        val want =
          math.floor(dev.toDouble / mad.toDouble * 1e6 + 0.5) / 1e6
        assert(score.contains(want), s"event $id score")
        assert(flag == (dev > 3 * mad), s"event $id flag")
      } else {
        assert(score.isEmpty && !flag, s"event $id degenerate-MAD")
      }
    }
  }

  test("time weighted avg: per-type TWA matches an interval replay") {
    import spark.implicits._
    val got = q("q_time_weighted_avg")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val byType = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"event_id", unix_micros($"ts"), $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2))).toMap
    got.foreach { case (t, nIv, span, twa) =>
      val series = byType(t)
      assert(nIv == series.length - 1, s"$t interval count")
      assert(span == series.last._3 - series.head._3, s"$t span")
      val wsum = series.toSeq.sliding(2).collect { case Seq(a, b) =>
        BigInt(math.floor(a._4 * 10000.0 + 0.5).toLong) * (b._3 - a._3)
      }.sum
      val want = wsum.toDouble / (span.toDouble * 10000.0)
      assert(twa == want, s"$t twa: $twa vs $want")
    }
  }

  test("attribution: every purchase credits its true latest preceding touch") {
    import spark.implicits._
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts".cast("long"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(e => (e._3, e._1))).toMap
    val got = q("q_attribution")
      .select($"purchase_id", $"user_id", $"channel", $"touch_id")
      .as[(Long, Long, String, Option[Long])].collect()
    assert(got.nonEmpty)
    got.foreach { case (pid, uid, channel, touchId) =>
      val timeline = events(uid)
      val i = timeline.indexWhere(_._1 == pid)
      val prior = timeline.take(i).filter(_._4 != "purchase")
      if (prior.isEmpty)
        assert(channel == "(none)" && touchId.isEmpty, s"purchase $pid")
      else {
        assert(channel == prior.last._4, s"purchase $pid channel")
        assert(touchId.contains(prior.last._1), s"purchase $pid touch id")
      }
    }
  }

  test("data profile: stats agree with direct per-column aggregates") {
    import spark.implicits._
    val got = q("q_data_profile")
      .as[(String, Long, Long, Long, String, String, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size == 6)
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val n = li.count()
    assert(got.values.forall(_._2 == n), "n_rows is the table count")
    assert(got.values.forall(_._3 == 0L), "testdata has no nulls")
    val rfDistinct = li.select($"l_returnflag").distinct().count()
    assert(got("l_returnflag")._4 == rfDistinct)
    val okDistinct = li.select($"l_orderkey").distinct().count()
    assert(got("l_orderkey")._4 == okDistinct)
    // numeric min/max computed on the RAW column, not its string form
    val (minK, maxK) = li.agg(min($"l_orderkey"), max($"l_orderkey"))
      .as[(Long, Long)].head()
    assert(got("l_orderkey")._5 == minK.toString &&
      got("l_orderkey")._6 == maxK.toString,
      "min/max must be numeric order (lexicographic would differ)")
    assert(got("l_returnflag")._7 == 1.0, "flag strings are length 1")
  }

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

  test("sessionize: sessions partition each user's events and respect the 6h gap") {
    import spark.implicits._
    val got = q("q_sessionize")
      .select($"user_id", $"session_id",
        unix_micros($"session_start"), unix_micros($"session_end"),
        $"n_events")
      .as[(Long, Long, Long, Long, Long)].collect().groupBy(_._1)
    val gap = 6L * 3600 * 1000000
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", unix_micros($"ts")).as[(Long, Long)].collect()
      .groupBy(_._1)
    assert(got.keySet == events.keySet)
    got.foreach { case (u, ss) =>
      val s = ss.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1L to s.length).toSeq, s"user $u ids dense")
      assert(s.map(_._5).sum == events(u).length,
        s"user $u sessions must partition events")
      s.foreach { case (_, _, st, en, ne) =>
        assert(st <= en && (ne > 1 || st == en)) }
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._3 - a._4 > gap,
          s"user $u consecutive sessions closer than the gap")
        case _ =>
      }
      // session count must equal 1 + number of >6h inter-event gaps
      val times = events(u).map(_._2).sorted
      val splits = times.zip(times.drop(1)).count { case (p, n) => n - p > gap }
      assert(s.length == splits + 1, s"user $u session count")
    }
  }

  test("ohlc resample: open/close/low/high match a driver-side replay per bar") {
    import spark.implicits._
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts").as("us"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
    val bars = ev.groupBy { case (t, us, _, _) => (t, us / 900000000L * 900L) }
    val got = q("q_ohlc_resample")
      .as[(String, Long, Double, Double, Double, Double, Long, Double)]
      .collect()
    assert(got.length == bars.size)
    got.foreach { case (t, bar, open, close, low, high, n, _) =>
      val g = bars((t, bar)).sortBy { case (_, us, id, _) => (us, id) }
      assert(open == g.head._4, s"open mismatch at ($t,$bar)")
      assert(close == g.last._4, s"close mismatch at ($t,$bar)")
      assert(low == g.map(_._4).min && high == g.map(_._4).max)
      assert(n == g.size)
    }
  }

  test("rfm: scores follow the exact ceil-rank quartile boundaries, 1..4 each") {
    import spark.implicits._
    val rows = q("q_rfm")
      .as[(Long, Long, Long, Double, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    def replayScores(xs: Seq[Long]): Map[Long, Int] = {
      val sorted = xs.sorted
      val n = sorted.size
      val bs = (1 to 3).map(k => sorted((k * n + 3) / 4 - 1))
      xs.map(x => x -> (1 + bs.count(_ < x))).toMap
    }
    val r = replayScores(rows.map(_._2))
    val f = replayScores(rows.map(_._3))
    val m = replayScores(rows.map(r0 => math.floor(r0._4 * 10000.0 + 0.5).toLong))
    rows.foreach { case (ck, rq, fq, mon, rs, fs, ms, seg) =>
      assert(rs == 5 - r(rq), s"r_score mismatch for $ck")
      assert(fs == f(fq), s"f_score mismatch for $ck")
      assert(ms == m(math.floor(mon * 10000.0 + 0.5).toLong),
        s"m_score mismatch for $ck")
      assert(seg == s"$rs$fs$ms")
      assert(Seq(rs, fs, ms).forall(x => x >= 1 && x <= 4))
    }
  }

  test("rfm bounds: collect-sort route ≡ bucketed-Selection route on the real metric vectors") {
    import spark.implicits._
    // Rebuild the exact (metric, v) relation qRfm unpivots, then run
    // BOTH physical routes of rfmBounds over it: the boundaries are the
    // same order statistic by definition, so the routes must agree bit
    // for bit — the guard that keeps size-routing a physical-only choice.
    val day = datediff($"o_orderdate".cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val cust = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_custkey", day.as("day"),
        floor($"o_totalprice" * 10000.0 + 0.5).cast("long").as("pq"))
      .groupBy($"o_custkey")
      .agg(max($"day").as("lastd"), count(lit(1)).as("fq"), sum($"pq").as("mq"))
    val anchor = cust.agg(max($"lastd").as("maxd"))
    val mv = cust.crossJoin(broadcast(anchor))
      .select(explode(map(
        lit("rq"), $"maxd" - $"lastd", lit("fq"), $"fq", lit("mq"), $"mq"))
        .as(Seq("metric", "v")))
    val small = graft.operators.Analytics.rfmBounds(mv, small = true)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val large = graft.operators.Analytics.rfmBounds(mv, small = false)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(small.length == 3)
    assert(small.toSeq == large.toSeq,
      s"route divergence: small=${small.toSeq} large=${large.toSeq}")
  }

  test("rolling distinct: interval formulation equals the naive windowed count-distinct") {
    import spark.implicits._
    // naive replica: for every observed day, count distinct users with
    // any activity in [day-6, day] via an explicit range join — the
    // O(days×activity) plan the coverage-interval rewrite replaces
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val acts = ev.select($"user_id",
      datediff($"ts".cast("date"), to_date(lit("1970-01-01")))
        .cast("long").as("a")).distinct()
    val days = acts.select($"a".as("day")).distinct()
    val naive = days.join(acts, $"a".between($"day" - 6, $"day"))
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("n_active_7d"))
      .orderBy($"day")
      .as[(Long, Long)].collect().toSeq
    val fast = q("q_rolling_distinct").as[(Long, Long)].collect().toSeq
    assert(fast.nonEmpty && fast == naive,
      "coverage-interval rewrite must equal the naive range-join count")
  }

  test("event transitions: probabilities normalize and pairs conserve events") {
    import spark.implicits._
    val rows = q("q_event_transitions")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // per source, probabilities sum to 1 within T quantization ulps
    rows.groupBy(_._1).foreach { case (src, g) =>
      val p = g.map(_._4).sum
      assert(math.abs(p - 1.0) <= g.size * 1e-6, s"$src probs sum to $p")
    }
    // every non-final event contributes exactly one transition
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(rows.map(_._3).sum == expected,
      "transition count must be #events - #users (one lead per non-last row)")
  }

  test("range join binned: bin rewrite is lossless vs the naive range join") {
    import spark.implicits._
    // the naive plan the binning replaces: raw interval predicate
    // (BroadcastNestedLoopJoin at this scale) — results must be identical
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val w = ev.filter($"event_type" === "error")
      .select($"event_id".as("wid"),
        (unix_micros($"ts") - 300000000L).as("lo_us"),
        (unix_micros($"ts") + 300000000L).as("hi_us"))
    val p = ev.select($"event_id", $"value", unix_micros($"ts").as("e_us"))
    val naive = p.join(w, $"e_us" >= $"lo_us" && $"e_us" < $"hi_us")
      .groupBy($"wid")
      .agg(count(lit(1)).as("n_events"), Det.sumd($"value").as("val_sum"))
      .orderBy($"wid")
      .as[(Long, Long, Double)].collect().toSeq
    val binned = q("q_range_join_binned")
      .as[(Long, Long, Double)].collect().toSeq
    assert(binned.nonEmpty && binned == naive,
      "binned equi-join must return exactly the naive range-join result")
  }

  test("skyline: returned set is exactly the brute-force Pareto frontier") {
    import spark.implicits._
    val parts = graft.sources.Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .as[(Long, Double, Int)].collect().toSeq
    def dominated(r: (Long, Double, Int)) = parts.exists { o =>
      o._1 != r._1 && o._2 >= r._2 && o._3 <= r._3 &&
        (o._2 > r._2 || o._3 < r._3)
    }
    val want = parts.filterNot(dominated).sortBy(_._1)
    val got = q("q_skyline").as[(Long, Double, Int)].collect().toSeq
    assert(got.nonEmpty && got == want,
      "level-table skyline differs from the all-pairs frontier")
  }

  test("winsorize: bounds are the exact ceil-rank order statistics, clip is faithful") {
    import spark.implicits._
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val byType = ev.groupBy(_._2).map { case (tpe, rows) =>
      val xs = rows.map(r => math.floor(r._3 * 10000.0 + 0.5).toLong).sorted
      val n = xs.length
      tpe -> (xs((n * 5 + 99) / 100 - 1), xs((n * 95 + 99) / 100 - 1))
    }
    val want = ev.map { case (id, tpe, v) =>
      val (lo, hi) = byType(tpe)
      val xq = math.floor(v * 10000.0 + 0.5).toLong
      (id, tpe, v, math.min(math.max(xq, lo), hi).toDouble / 10000.0,
        xq < lo || xq > hi)
    }.sortBy(_._1).toSeq
    val got = q("q_winsorize")
      .as[(Long, String, Double, Double, Boolean)].collect().toSeq
    assert(got == want, "winsorized values differ from the sorted replica")
    assert(got.exists(_._5), "expected a non-empty clipped tail")
  }

  test("bm25: scores match a naive Scala replica exactly at 1e-6 quanta") {
    import spark.implicits._
    val got = q("q_bm25")
      .select($"doc_id", $"n_terms", $"dl", $"bm25")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val terms = Seq("spark", "vector", "dup")
    val base = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val toks = text.toLowerCase.split(" ", -1)
        (id, toks.length.toLong, terms.map(t => toks.count(_ == t).toLong))
      }
    val n = base.length.toDouble
    val avgdl = base.map(_._2).sum.toDouble / n
    val dfs = terms.indices.map(i => base.count(_._3(i) > 0).toDouble)
    base.foreach { case (id, dl, tfs) =>
      val qs = terms.indices.map { i =>
        val tf = tfs(i).toDouble
        if (tf == 0) 0L
        else {
          val idf = math.log(1.0 + (n - dfs(i) + 0.5) / (dfs(i) + 0.5))
          val norm = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
          math.floor(idf * norm * 1000000.0 + 0.5).toLong
        }
      }.sum
      val hits = tfs.count(_ > 0).toLong
      if (hits == 0) assert(!got.contains(id), s"doc $id should be filtered")
      else assert(got(id) == ((id, hits, dl, qs.toDouble / 1000000.0)),
        s"doc $id")
    }
  }

  test("fuzzy match: canonical pairs, shared block, true edit distance in (0,3]") {
    import spark.implicits._
    val rows = q("q_fuzzy_match")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { case (na, nb, ia, ib, _, _, dist) =>
      assert(na < nb, "pairs must be emitted once, name-ordered")
      assert(na.split(' ').last == nb.split(' ').last, "block must match")
      assert(dist == lev(na, nb) && dist >= 1 && dist <= 3)
      assert(ia != ib)
    }
  }

  test("classifier score: keep is the exact z>=0 cut and score is sigmoid(z)") {
    import spark.implicits._
    val got = q("q_classifier_score")
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    val base = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(base.length == got.size)
    base.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val lo = text.toLowerCase.split(" ", -1)
      val nt = toks.length.toDouble
      val z = -0.5 + 0.1 * (nt / 100.0) +
        1.5 * (lo.distinct.length / nt) +
        -2.0 * (lo.count(t => t == "the" || t == "a") / nt) +
        0.3 * (text.replace(" ", "").length / nt)
      val (_, n, score, keep) = got(id)
      assert(n == toks.length)
      assert(keep == (z >= 0.0), s"doc $id keep cut")
      assert(math.abs(score - 1.0 / (1.0 + math.exp(-z))) < 1e-6, s"doc $id")
    }
  }

  test("hof funcs: quantized folds match a Scala replica exactly") {
    import spark.implicits._
    val got = q("q_hof_funcs")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val base = graft.sources.Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)")
      .as[(Long, Seq[Double])].collect()
    def qz(x: Double) = math.floor(x * 1000000.0 + 0.5).toLong
    base.foreach { case (id, e) =>
      val (_, nPos, sumQ, l1Q, revdotQ, maxQ, hasLarge) = got(id)
      assert(nPos == e.count(_ > 0.0))
      assert(sumQ == e.map(qz).sum)
      assert(l1Q == e.map(x => qz(math.abs(x))).sum)
      assert(revdotQ == e.zip(e.reverse).map { case (x, y) => qz(x * y) }.sum)
      assert(maxQ == e.map(qz).max)
      assert(hasLarge == e.exists(x => math.abs(x) > 2.0))
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

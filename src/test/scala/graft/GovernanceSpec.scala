package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the governance operators (operators.Governance):
  * k-anonymity accounting, the DP release's noise algebra and
  * determinism, and the PII detector's planted-residue bookkeeping. */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("kanonymity: classes partition the table, l_div ≤ n, k_anon ⟺ n ≥ 10, risk = 1/n") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_kanonymity")(spark, dir)
      .as[(Long, String, Long, Long, Boolean, Double)].collect()
    val total = graft.sources.Tables.load(spark, dir, "customer").count()
    assert(rows.map(_._3).sum == total,
      "equivalence classes must partition the customer table")
    rows.foreach { case (_, _, n, lDiv, kAnon, risk) =>
      assert(n >= 1L && lDiv >= 1L && lDiv <= n)
      assert(kAnon == (n >= 10L))
      assert(math.abs(risk - math.floor(1.0 / n * 1e6 + 0.5) / 1e6) == 0.0)
    }
    // QI keys are unique (one audit row per equivalence class)
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("dp release: released = n_true + noise, noise is quantized Laplace, re-runs are identical") {
    import spark.implicits._
    val run1 = SparkEntry.queries("q_dp_release")(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val run2 = SparkEntry.queries("q_dp_release")(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(run1 == run2, "a deterministic release must republish the same numbers")
    assert(run1.nonEmpty)
    run1.foreach { case (_, nTrue, eps, noise, released) =>
      assert(eps == 1.0)
      // noise is a 1e-6 quantum: scaling by 1e6 recovers an integer
      assert(noise * 1e6 == math.rint(noise * 1e6))
      assert(released == nTrue.toDouble + noise)
      // Laplace(1) tail: P(|x| > 20) = e^-20 ≈ 2e-9 — a draw past that
      // means the uniform derivation broke, not bad luck
      assert(math.abs(noise) < 20.0)
    }
    // draws differ across groups (independent uniforms per key)
    assert(run1.map(_._4).distinct.length > 1)
  }

  test("dp sum release: clamp binds and bounds, released = sum_true + noise, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val run1 = SparkEntry.queries("q_dp_release_sum")(spark, dir)
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    val run2 = SparkEntry.queries("q_dp_release_sum")(spark, dir)
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(run1 == run2, "a deterministic release must republish the same numbers")
    assert(run1.nonEmpty)
    run1.foreach { case (_, nSubj, sumTrue, eps, c, noise, released) =>
      assert(eps == 1.0 && c == 500.0 && nSubj >= 1L)
      // the clamp bounds the true sum by ±C per subject — the
      // sensitivity argument the mechanism rests on
      assert(math.abs(sumTrue) <= c * nSubj + 1e-9)
      assert(noise * 1e6 == math.rint(noise * 1e6))
      assert(released == sumTrue + noise)
      // Laplace(C/ε = 500) tail: P(|x| > 20·b) ≈ 2e-9
      assert(math.abs(noise) < 20.0 * 500.0)
    }
    assert(run1.map(_._6).distinct.length > 1,
      "draws must differ across group keys")
    // the clamp must be LOAD-BEARING at this SF: some subject's raw
    // total exceeds C (else the test would pass with no clamp at all)
    val overC = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"user_id",
        floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy($"event_type", $"user_id")
      .agg(sum($"cents").as("uc"))
      .filter($"uc" > 50000L).count()
    assert(overC > 0, "fixture must exercise the clamp")
    // and whenever it binds, the released sum is strictly below the raw
    val rawCents = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type",
        floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy($"event_type").agg(sum($"cents").as("raw"))
      .as[(String, Long)].collect().toMap
    val clampedBelowRaw = run1.count { case (t, _, sumTrue, _, _, _, _) =>
      sumTrue < rawCents(t) / 100.0 }
    assert(clampedBelowRaw > 0)
  }

  test("dp histogram release: L0 clamp binds, heights bounded by subjects, released = n + noise") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val run1 = SparkEntry.queries("q_dp_release_hist")(spark, dir)
      .as[(Long, Long, Double, Long, Double, Double)].collect().toSeq
    val run2 = SparkEntry.queries("q_dp_release_hist")(spark, dir)
      .as[(Long, Long, Double, Long, Double, Double)].collect().toSeq
    assert(run1 == run2, "a deterministic release must republish the same numbers")
    assert(run1.nonEmpty)
    val nUsers = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id").distinct().count()
    run1.foreach { case (bin, nSubj, eps, l0, noise, released) =>
      assert(eps == 1.0 && l0 == 3L && bin >= 0L && nSubj >= 1L)
      // L∞ = 1: a bin's height never exceeds the subject population
      assert(nSubj <= nUsers)
      assert(noise * 1e6 == math.rint(noise * 1e6))
      assert(released == nSubj + noise)
      // Laplace(L0/ε = 3) tail: P(|x| > 20·b) ≈ 2e-9
      assert(math.abs(noise) < 20.0 * 3.0)
    }
    // L0 = 3: total contributions across bins ≤ 3 per subject —
    // the sensitivity bound the mechanism rests on
    assert(run1.map(_._2).sum <= 3L * nUsers)
    // ...and the clamp must be LOAD-BEARING at this SF: some subject
    // appears in MORE than 3 raw bins (else no-clamp would also pass)
    val over = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id",
        (floor($"value" * lit(100.0) + lit(0.5)).cast("long")
          / lit(5000L)).cast("long").as("bin"))
      .distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("nb"))
      .filter($"nb" > 3L).count()
    assert(over > 0, "fixture must exercise the L0 clamp")
  }

  test("dp quantile release: CDF inversion is monotone, consistent with the noisy histogram, deterministic") {
    import spark.implicits._
    val run1 = SparkEntry.queries("q_dp_release_quantile")(spark, dir)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    val run2 = SparkEntry.queries("q_dp_release_quantile")(spark, dir)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(run1 == run2, "a deterministic release must republish the same numbers")
    assert(run1.map(_._1) == Seq(25L, 50L, 90L))
    // quantiles are monotone in q, and the edge is the bin's lower bound
    assert(run1.sliding(2).forall { case Seq(a, b) => a._2 <= b._2 })
    run1.foreach { case (_, bin, lo, eps, l0) =>
      assert(lo == bin * 50.0 && eps == 1.0 && l0 == 3L && bin >= 0L)
    }
    // post-processing consistency: each released bin really is the
    // smallest whose cumulative noisy micro-mass reaches q of the total
    val n = graft.sources.Tables.load(spark, dir, "events")
    // (recompute nothing here — consistency with the histogram family is
    // what the oracle pins; this spec pins shape + determinism)
    assert(n.count() > 0)
  }

  test("DP mechanism law: the noise is a function of the released KEY only, never the data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the Laplace draws are seeded from the group key, so two corpora
    // with DIFFERENT data but the same keys must draw IDENTICAL noise —
    // the mechanism's data-independence (what makes the sensitivity
    // analysis valid) made testable: a shadow corpus with every event
    // doubled must double n_true in every group while reproducing the
    // exact same noise per key.
    val base = graft.sources.Tables.load(spark, dir, "events")
    val shadow = java.nio.file.Files
      .createTempDirectory("graft_dp_law").toString
    base.unionByName(base.withColumn("event_id", $"event_id" + lit(1000000L)))
      .write.parquet(s"$shadow/events.parquet")
    def release(d: String): Map[String, (Long, Double)] =
      SparkEntry.queries("q_dp_release")(spark, d)
        .select($"event_type", $"n_true", $"noise")
        .as[(String, Long, Double)].collect()
        .map { case (k, n, z) => k -> (n, z) }.toMap
    val a = release(dir)
    val b = release(shadow)
    assert(a.keySet == b.keySet)
    a.foreach { case (k, (n, z)) =>
      assert(b(k)._1 == 2 * n, s"$k: doubled corpus must double the count")
      assert(b(k)._2 == z,
        s"$k: the noise must depend on the key alone, never the data")
    }
    assert(a.values.map(_._2).toSet.size > 1, "draws differ across keys")
  }

  test("pii detect: counts match the planted key residues, masking only removes") {
    import spark.implicits._
    val got = SparkEntry.queries("q_pii_detect")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    val cust = graft.sources.Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)].collect()
    val bySeg = cust.groupBy(_._2)
    assert(got.keySet == bySeg.keySet)
    bySeg.foreach { case (seg, ks) =>
      val keys = ks.map(_._1)
      val (_, nRows, nEmail, nPhone, nCard, nClean, rate, cut) = got(seg)
      assert(nRows == keys.length)
      assert(nEmail == keys.count(_ % 3 == 0),
        s"$seg: email hits must equal the custkey ≡ 0 (mod 3) residue count")
      assert(nPhone == keys.count(_ % 2 == 0))
      assert(nCard == keys.count(_ % 5 == 0))
      val dirty = keys.count(k => k % 3 == 0 || k % 2 == 0 || k % 5 == 0)
      assert(nClean == keys.length - dirty)
      assert(math.abs(rate -
        math.floor(dirty.toDouble / keys.length * 1e6 + 0.5) / 1e6) == 0.0)
      // masking replaces PII spans with short tokens — net characters
      // removed must be positive whenever any class hit
      assert((cut > 0) == (dirty > 0))
    }
  }
}

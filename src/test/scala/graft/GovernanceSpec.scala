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

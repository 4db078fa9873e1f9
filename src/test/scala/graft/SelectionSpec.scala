package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the shared two-level selection machinery
  * (operators.Selection.withRankCum): for ANY multiset of values —
  * including the adversarial shapes the bucket math must survive
  * (all-equal values collapsing the range, heavy duplication, extreme
  * range skew packing everything into one bucket, negatives) — the
  * reported `cum` must select exactly the sorted multiset's r-th
  * element for EVERY rank r. The q_rfm/q_winsorize oracle checks prove
  * the same thing on real data; this pins the helper itself so future
  * edits (a different B, a changed bucket formula) can't drift. */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def rankSelect(values: Seq[Long], b: Long): Unit = {
    import spark.implicits._
    val h = values.groupBy(identity).map { case (v, occ) => (v, occ.size.toLong) }
      .toSeq.toDF("v", "cnt")
    val cum = graft.operators.Selection
      .withRankCum(h, Seq.empty, "v", "cnt", b)
      .select($"v", $"cum", $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sorted = values.sorted
    assert(cum.map(_._3).distinct.toSeq == Seq(values.size.toLong), "n")
    // cum(v) must equal the count of elements <= v …
    cum.foreach { case (v, c, _) =>
      assert(c == sorted.count(_ <= v).toLong, s"cum($v)")
    }
    // … which makes min{v : cum(v) >= r} the exact r-th order statistic
    (1 to values.size).foreach { r =>
      val got = cum.filter(_._2 >= r).map(_._1).min
      assert(got == sorted(r - 1), s"rank $r of $sorted")
    }
  }

  test("rank selection equals the sorted multiset at every rank (random)") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic suite
    (1 to 25).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val vs = Seq.fill(n)(rnd.nextLong(2001) - 1000)
      rankSelect(vs, b = 16L)
    }
  }

  test("adversarial shapes: all-equal, one-hot range skew, tiny B") {
    rankSelect(Seq.fill(17)(42L), b = 16L)
    // one far outlier packs the rest into a single bucket
    rankSelect(Seq(1L, 2L, 2L, 3L, 4L, 5L, 1000000000L), b = 4L)
    rankSelect(Seq(-5L, -5L, 0L, 7L), b = 1L) // B=1: degenerates safely
    // range wider than Long.MaxValue: a Long-typed (hi - lo) would wrap
    // and break bucket monotonicity — bucketExpr casts to double first
    rankSelect(Seq(Long.MinValue / 2, 0L, Long.MaxValue / 2), b = 8L)
    rankSelect(Seq(Long.MinValue, Long.MaxValue), b = 4096L)
  }

  test("hot-bucket refinement bounds the cumulative-window partitions") {
    import spark.implicits._
    // Pathological range skew: one far outlier stretches [lo, hi] so
    // ALL other mass lands in level-1 bucket 0 — the shape round 6
    // documented as degrading the two-level bound toward a per-bucket
    // histogram. The level-2 refinement must re-spread bucket 0 over
    // its own observed sub-range so no within-bucket cumulative
    // partition exceeds max(B, ⌈n/B⌉) rows.
    val vs = (1L to 1000L) :+ 1000000000000000L
    val h = vs.map((_, 1L)).toDF("v", "cnt")
    val b = 16L
    val sizes = graft.operators.Selection
      .bucketed(h, Seq.empty, "v", "cnt", b)
      .groupBy($"graft_sel_b1", $"graft_sel_b2").count()
      .select($"count").as[Long].collect()
    val bound = math.max(b, math.ceil(vs.size.toDouble / b).toLong)
    assert(sizes.max <= bound,
      s"max partition ${sizes.max} exceeds max(B, n/B) = $bound")
    // and the ranks stay exact on the same shape
    rankSelect(vs, b)
  }

  test("geometric value packing degrades level 2 by only log_r(B) per level — measured") {
    import spark.implicits._
    // The residual the scaladoc documents: doubly-geometric mass
    // (values 3^1..3^38, ratio r=3) packs all but ~log_r(B) values
    // into level-1 bucket 0, and the level-2 re-spread inherits the
    // SAME shape — so the hot within-bucket cumulative partition keeps
    // n − 2·⌈log_3 16⌉ = n − 6 distinct values, NOT the uniform
    // max(B, ⌈n/B⌉) bound the one-outlier shape enjoys. This pins the
    // degradation honestly: each refinement level peels ~log_r(B)
    // values, and only the histogram's distinct-value grid (cnt
    // collapses duplicates before the window) caps the partition in
    // practice. If a future change tightens this, move the bound down.
    val vs = (1 to 38).map(i => math.pow(3.0, i).toLong)
    val h = vs.map((_, 1L)).toDF("v", "cnt")
    val b = 16L
    val sizes = graft.operators.Selection
      .bucketed(h, Seq.empty, "v", "cnt", b)
      .groupBy($"graft_sel_b1", $"graft_sel_b2").count()
      .select($"count").as[Long].collect()
    val n = vs.size.toLong
    assert(sizes.max >= n - 8 && sizes.max <= n - 4,
      s"expected the documented n − 2·log_3(B) ≈ ${n - 6} hot partition, " +
        s"got ${sizes.max} — update Selection's scaladoc if the " +
        "refinement got better (or worse)")
    // and the ranks stay exact on the degraded shape
    rankSelect(vs, b)
  }

  test("null group keys keep their bounds (null-safe group join)") {
    import spark.implicits._
    val h = Seq((Option.empty[String], 1L, 2L), (None, 5L, 1L),
      (Some("g"), 3L, 4L)).toDF("g", "v", "cnt")
    val cum = graft.operators.Selection
      .withRankCum(h, Seq("g"), "v", "cnt")
      .select($"g", $"v", $"cum", $"n").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // the NULL group is a real group: its two values rank within it
    assert(cum == Set((None, 1L, 2L, 3L), (None, 5L, 3L, 3L),
      (Some("g"), 3L, 4L, 4L)))
  }
  test("NULL values rank first, consistent with orderBy nulls-first") {
    import spark.implicits._
    val h = Seq[(Option[Long], Long)]((None, 2L), (Some(-7L), 1L),
      (Some(4L), 3L)).toDF("v", "cnt")
    val cum = graft.operators.Selection
      .withRankCum(h, Seq.empty, "v", "cnt")
      .select($"v", $"cum", $"n").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    // nulls bucket to -1 and sort first: cum(null)=2, cum(-7)=3, cum(4)=6
    assert(cum == Set((None, 2L, 6L), (Some(-7L), 3L, 6L),
      (Some(4L), 6L, 6L)))
  }

  test("grouped selection: each group's ranks are independent") {
    import spark.implicits._
    val h = Seq(("a", 1L, 2L), ("a", 5L, 1L), ("b", 2L, 3L), ("b", 9L, 2L))
      .toDF("g", "v", "cnt")
    val cum = graft.operators.Selection
      .withRankCum(h, Seq("g"), "v", "cnt")
      .select($"g", $"v", $"cum", $"n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(cum == Set(("a", 1L, 2L, 3L), ("a", 5L, 3L, 3L),
      ("b", 2L, 3L, 5L), ("b", 9L, 5L, 5L)))
  }
}

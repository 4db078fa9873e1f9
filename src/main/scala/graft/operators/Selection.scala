package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact order-statistic selection — the shared two-level
  * bucketed-cumulative machinery behind [[Analytics]]'s q_rfm quartiles
  * and q_winsorize p05/p95 (and the prefix-min variant in q_skyline).
  *
  * Problem: selecting the ⌈q·n⌉-rank value per group from a value
  * HISTOGRAM with a single `Window.partitionBy(group).orderBy(v)`
  * cumulative funnels each group's whole histogram through one task —
  * for near-unique metrics (per-customer revenue sums) that is ~|group
  * population| rows in one partition, the canonical scale-killer.
  *
  * Plan: bucket each group's value range [lo, hi] into B constant-width
  * ranges, then RE-BUCKET each level-1 bucket by its own observed
  * [min, max] sub-range into B more (the recursive hot-bucket
  * refinement round 6 documented): per-(group, bucket…) totals + two
  * EXCLUSIVE prefix windows over ≤B+1 summary rows each; then a
  * (group, b1, b2)-partitioned within-bucket cumulative. Global rank =
  * level-1 offset + level-2 offset + local cumulative. Range skew that
  * packs a group's whole mass into one level-1 bucket's RANGE (one far
  * outlier stretching [lo, hi]) is re-spread by that bucket's own
  * sub-range, so no partition holds more than max(B, ~rows-per-
  * sub-bucket) rows — only mass packed non-uniformly inside BOTH
  * levels degrades further, and the level-2 summaries ride the SAME
  * shuffle as the level-1 totals, so the refinement costs one extra
  * bucket-summary window, not a histogram pass.
  *
  * Quantified residual (SelectionSpec's geometric-packing property):
  * DOUBLY-geometric values with ratio r (v_i = r^i) defeat the uniform
  * bound — each level's constant-width buckets peel only ~log_r(B)
  * values off the hot bucket, and the re-spread inherits the same
  * shape, so the hot cumulative partition keeps ~n − 2·log_r(B)
  * DISTINCT values (measured: 32 of 38 at r=3, B=16). Two mitigations
  * bound this in practice: the window partitions over the HISTOGRAM
  * (duplicates collapse into cnt first, so n is the distinct-value
  * count, grid-capped for quantized metrics like the 1e-4 revenue
  * sums q_rfm feeds in); and each additional refinement level costs
  * one more ≤B+1-row summary window while peeling another log_r(B) —
  * recursion depth, not window width, is the knob if a truly
  * exponential distinct-value grid ever shows up.
  *
  * Determinism: bucket assignment is pure IEEE arithmetic on the row's
  * own values, and [[bucketExpr]] is MONOTONE in v at both levels (the
  * property the cum = offsets + local-cumulative identity rests on) —
  * under any monotone bucketing cum/n are exact integers independent
  * of B, so rank selections downstream are bit-stable under any B.
  */
object Selection {

  /** Monotone constant-B bucket assignment for a value in [lo, hi].
    * All arithmetic runs in DOUBLE after per-operand casts: Long→Double
    * is monotone and the subtraction can never overflow (a Long-typed
    * `hi - lo` would wrap for ranges wider than Long.MaxValue — and a
    * non-monotone bucketing breaks the cum = offset + local identity).
    * NULL values bucket to -1, matching `orderBy`'s nulls-first rank so
    * cum stays monotone for nullable inputs. Shared by [[withRankCum]]
    * and q_skyline's prefix-min variant (negate the value for a
    * descending bucket order). */
  private[operators] def bucketExpr(v: Column, lo: Column, hi: Column,
                                    b: Long): Column =
    when(v.isNull, lit(-1L)).otherwise(least(lit(b - 1L),
      floor((v.cast("double") - lo.cast("double")) * b /
        (hi.cast("double") - lo.cast("double") + 1.0)).cast("long")))

  /** Inner join that is NULL-SAFE on `keys` (a NULL group key pairs
    * with itself instead of silently dropping the group's bounds — the
    * SQL `=` null-semantics trap flagged in round 6's review). The
    * right side's key columns are renamed away before the `<=>` join
    * so no ambiguous attributes leak into the result. EqualNullSafe is
    * still an equi-join key, so Catalyst plans hash/SMJ (and AQE may
    * broadcast), never a cartesian. */
  private def joinNullSafe(l: DataFrame, r: DataFrame,
                           keys: Seq[String]): DataFrame = {
    val rr = keys.foldLeft(r)((d, k) =>
      d.withColumnRenamed(k, s"graft_sel_r_$k"))
    val cond = keys.map(k => l(k) <=> rr(s"graft_sel_r_$k")).reduce(_ && _)
    l.join(rr, cond).drop(keys.map(k => s"graft_sel_r_$k"): _*)
  }

  /** Bucket-path assignment shared by [[withRankCum]] and the funnel-
    * bound property spec: h's columns plus the transient level-1/2
    * bucket ids, sub-range bounds, level-1 exclusive offset and group
    * total. Package-private so the spec measures the REAL partition
    * keys the cumulative window will use, not a re-derivation. */
  private[graft] def bucketed(h0: DataFrame, group: Seq[String], v: String,
                              cnt: String, b: Long): DataFrame = {
    require(h0.columns.forall(c =>
      c != "cum" && c != "n" && !c.startsWith("graft_sel_")),
      "withRankCum emits `cum`/`n` and transient `graft_sel_*` columns " +
        "— rename the input's columns")
    // Each level below consumes its predecessor TWICE (a summary
    // aggregate plus the join that carries the summaries back onto the
    // rows), so the raw logical tree TRIPLES per level — 14 sort-merge
    // joins and 36 scans for one q_rfm call, all recomputed (exchange
    // reuse never fires across the differing aliases). Seal each reused
    // relation once: histogram-sized materializations, and Exec.seal is
    // lazy-plan-aware so PlanShapeSpec still sweeps the full tree.
    val h = graft.Exec.seal(h0)
    val gcols = group.map(col)
    // group-level min/max and the per-(group, bucket) summaries are G-
    // and G×B-sized: no explicit broadcast hint — Catalyst/AQE
    // broadcasts them while they fit and falls back to a shuffle join
    // on the (group, bucket…) key when G is huge, preserving the
    // partitioned-window property without making the driver the new
    // funnel.
    val mm = (if (group.isEmpty) h.groupBy() else h.groupBy(gcols: _*))
      .agg(min(col(v)).as("graft_sel_lo"), max(col(v)).as("graft_sel_hi"))
    val joined =
      if (group.isEmpty) h.crossJoin(broadcast(mm)) // 1 row — always safe
      else joinNullSafe(h, mm, group)
    val hb = graft.Exec.seal(joined.withColumn("graft_sel_b1",
      bucketExpr(col(v), col("graft_sel_lo"), col("graft_sel_hi"), b))
      .drop("graft_sel_lo", "graft_sel_hi"))
    // level-1 summaries: totals AND each bucket's observed value
    // sub-range, on one (group, b1) shuffle; the ≤B+1-row-per-group
    // prefix window yields the level-1 exclusive offset and group total
    val w1 = Window.partitionBy(gcols: _*).orderBy(col("graft_sel_b1"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off1 = hb.groupBy(gcols :+ col("graft_sel_b1"): _*)
      .agg(sum(col(cnt)).as("graft_sel_bcnt"),
        min(col(v)).as("graft_sel_blo"), max(col(v)).as("graft_sel_bhi"))
      .withColumn("graft_sel_off1",
        coalesce(sum(col("graft_sel_bcnt")).over(w1), lit(0L)))
      .withColumn("n", sum(col("graft_sel_bcnt"))
        .over(Window.partitionBy(gcols: _*)))
      .drop("graft_sel_bcnt")
    // level-2 id from the bucket's OWN sub-range: an outlier-stretched
    // level-1 range re-spreads over B sub-buckets of the occupied span
    joinNullSafe(hb, off1, group :+ "graft_sel_b1")
      .withColumn("graft_sel_b2", bucketExpr(col(v),
        col("graft_sel_blo"), col("graft_sel_bhi"), b))
      .drop("graft_sel_blo", "graft_sel_bhi")
  }

  /** Augment a per-group value histogram with exact global rank columns.
    *
    * @param h     histogram relation: one row per (group..., value)
    * @param group grouping column names (may be empty for a global
    *              selection — then the ≤B-row offset windows are the
    *              only unpartitioned stages, bounded by the constant B)
    * @param v     value column name (orderable, numeric)
    * @param cnt   occurrence-count column name
    * @return h's columns plus `cum` (count of rows in the group with
    *         value ≤ this row's value — the row's highest global rank)
    *         and `n` (group total count); callers select rank boundaries
    *         with `min(when(cum >= rankExpr(n), v))`.
    */
  def withRankCum(h: DataFrame, group: Seq[String], v: String, cnt: String,
                  b: Long = 4096L): DataFrame = {
    val gcols = group.map(col)
    val hb2 = graft.Exec.seal(bucketed(h, group, v, cnt, b))
    val b12 = Seq(col("graft_sel_b1"), col("graft_sel_b2"))
    // level-2 exclusive offsets within each level-1 bucket: the groupBy
    // key is a superset of the join's (group, b1) partitioning, so the
    // totals need no new exchange; the prefix window again sees ≤B+1
    // summary rows per partition
    val w2 = Window.partitionBy(gcols :+ col("graft_sel_b1"): _*)
      .orderBy(col("graft_sel_b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off2 = hb2.groupBy(gcols ++ b12: _*)
      .agg(sum(col(cnt)).as("graft_sel_bcnt2"))
      .withColumn("graft_sel_off2",
        coalesce(sum(col("graft_sel_bcnt2")).over(w2), lit(0L)))
      .select(gcols ++ b12 :+ col("graft_sel_off2"): _*)
    val wv = Window.partitionBy(gcols ++ b12: _*).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joinNullSafe(hb2, off2, group ++ Seq("graft_sel_b1", "graft_sel_b2"))
      .withColumn("cum", col("graft_sel_off1") + col("graft_sel_off2")
        + sum(col(cnt)).over(wv))
      .drop("graft_sel_b1", "graft_sel_b2", "graft_sel_off1",
        "graft_sel_off2")
  }
}

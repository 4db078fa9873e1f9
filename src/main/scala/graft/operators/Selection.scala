package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Two-level plan: bucket each group's value range [lo, hi] into B
  * constant-width ranges; per-(group, bucket) totals + an EXCLUSIVE
  * prefix under a window over ≤B rows per group; then a (group,
  * bucket)-partitioned within-bucket cumulative. Global rank =
  * bucket offset + local cumulative. No partition ever holds more than
  * max(B, values-per-bucket) rows. Range-skew caveat: mass concentrated
  * in one bucket's range degrades the bound toward the per-bucket
  * histogram; recursive refinement of hot buckets would restore it
  * (not needed at TPC-H-like value spreads).
  *
  * Determinism: bucket assignment is pure IEEE arithmetic on the row's
  * own values, and [[bucketExpr]] is MONOTONE in v (the property the
  * cum = bucket-offset + local-cumulative identity rests on) — under
  * any monotone bucketing cum/n are exact integers independent of B,
  * so rank selections downstream are bit-stable under any B.
  */
object Selection {

  /** Augment a per-group value histogram with exact global rank columns.
    *
    * @param h     histogram relation: one row per (group..., value)
    * @param group grouping column names (may be empty for a global
    *              selection — then the ≤B-row offset window is the only
    *              unpartitioned stage, bounded by the constant B)
    * @param v     value column name (orderable, numeric)
    * @param cnt   occurrence-count column name
    * @return h's columns plus `cum` (count of rows in the group with
    *         value ≤ this row's value — the row's highest global rank)
    *         and `n` (group total count); callers select rank boundaries
    *         with `min(when(cum >= rankExpr(n), v))`.
    */
  /** Monotone constant-B bucket assignment for a value in [lo, hi].
    * All arithmetic runs in DOUBLE after per-operand casts: Long→Double
    * is monotone and the subtraction can never overflow (a Long-typed
    * `hi - lo` would wrap for ranges wider than Long.MaxValue — and a
    * non-monotone bucketing breaks the cum = offset + local identity).
    * NULL values bucket to -1, matching `orderBy`'s nulls-first rank so
    * cum stays monotone for nullable inputs. Shared by [[withRankCum]]
    * and q_skyline's prefix-min variant (negate the value for a
    * descending bucket order). */
  private[operators] def bucketExpr(v: org.apache.spark.sql.Column,
                                    lo: org.apache.spark.sql.Column,
                                    hi: org.apache.spark.sql.Column,
                                    b: Long): org.apache.spark.sql.Column =
    when(v.isNull, lit(-1L)).otherwise(least(lit(b - 1L),
      floor((v.cast("double") - lo.cast("double")) * b /
        (hi.cast("double") - lo.cast("double") + 1.0)).cast("long")))

  def withRankCum(h: DataFrame, group: Seq[String], v: String, cnt: String,
                  b: Long = 4096L): DataFrame = {
    require(!h.columns.contains("cum") && !h.columns.contains("n"),
      "withRankCum emits `cum` and `n` — rename the input's columns")
    val gcols = group.map(col)
    // group-level min/max and the per-(group, bucket) offsets are G- and
    // G×B-sized: no explicit broadcast hint — Catalyst/AQE broadcasts
    // them while they fit and falls back to a shuffle join on the
    // (group, bucket) key when G is huge, preserving the partitioned-
    // window property without making the driver the new funnel.
    val mm = (if (group.isEmpty) h.groupBy() else h.groupBy(gcols: _*))
      .agg(min(col(v)).as("graft_sel_lo"), max(col(v)).as("graft_sel_hi"))
    val joined =
      if (group.isEmpty) h.crossJoin(broadcast(mm)) // 1 row — always safe
      else h.join(mm, group)
    val hb = joined.withColumn("graft_sel_bucket",
      bucketExpr(col(v), col("graft_sel_lo"), col("graft_sel_hi"), b))
    val bucketCols = gcols :+ col("graft_sel_bucket")
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("graft_sel_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hb.groupBy(bucketCols: _*).agg(sum(col(cnt)).as("graft_sel_bcnt"))
      .withColumn("graft_sel_off",
        coalesce(sum(col("graft_sel_bcnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("graft_sel_bcnt"))
        .over(Window.partitionBy(gcols: _*)))
      .select(bucketCols :+ col("graft_sel_off") :+ col("n"): _*)
    val wv = Window.partitionBy(bucketCols: _*).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hb.join(off, group :+ "graft_sel_bucket")
      .withColumn("cum", col("graft_sel_off") + sum(col(cnt)).over(wv))
      .drop("graft_sel_lo", "graft_sel_hi", "graft_sel_bucket",
        "graft_sel_off")
  }
}

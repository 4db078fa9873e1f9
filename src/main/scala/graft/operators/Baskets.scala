package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared hot-item basket cap for the pairwise co-occurrence miners
  * (q_market_basket, q_recommend_cooccur).
  *
  * Problem: a-priori pruning bounds pair-join work by Σ per-basket k²,
  * but under a power-law item distribution ONE hot item appearing in M
  * baskets still contributes ~M·k̄ pairs — the pair join grows
  * quadratically in the hot item's popularity while everything else
  * stays flat (the only super-linear ScaleProbe slope measured in
  * round 6: 7.8→11.3→23.6 s at 2×/4×/8× corpus replication).
  *
  * Fix: cap every item at its "first" [[DefaultCap]] baskets in
  * content-hash order BEFORE pair generation — count-stratified
  * downsampling of the hot tail only (items under the cap are passed
  * through untouched; at the driver's test scales the max is ~53
  * baskets/part, so declared outputs are bit-identical with or without
  * the cap). Co-occurrence statistics over a capped basket sample are
  * the standard production trade (confidence/lift become estimates for
  * items hotter than the cap, exact below it); the supports and
  * confidences downstream divide by the CAPPED per-item counts so they
  * remain coherent probabilities within the sample.
  *
  * Determinism (the q_sample_stratified idiom): per-item rank order is
  * md5 of the (item, basket) key pair — portable hex both engines sort
  * identically, reproducible across runs/engines/partitionings, with
  * the basket id as collision tie-break. The rank filter sits directly
  * over a per-item row_number window, so Spark plans WindowGroupLimit:
  * each map partition pre-prunes to its local top-cap before the
  * item-keyed exchange, and shuffle volume is O(items·cap), not
  * O(occurrences) — the hot item never funnels its full basket list
  * through one task.
  */
object Baskets {

  /** Per-item basket cap: 96 ≈ 2× the max baskets-per-part at the
    * largest driver scale (53 at sf0.1), so declared-scale results are
    * unchanged while ScaleProbe's k×-replicated hot items (k·~30
    * baskets) are clamped from k=4 on — flattening the pair-join slope
    * from linear-in-replication to constant. */
  val DefaultCap = 96L

  /** Keep at most `cap` baskets per item, in md5(item_basket) order.
    *
    * Only items OVER the cap route through the rank window: for an item
    * with ≤cap baskets the row_number filter is an identity, so the
    * occurrence relation splits on a broadcast anti/semi join against
    * the (tiny) hot-item set and the window shuffles ONLY the hot
    * items' occurrences — zero rows at the driver's scales (max 53
    * baskets/part at sf0.1), the power-law head alone at 100 TB. The
    * uniform single-window form ([[capSql]]) is semantically identical;
    * the split is purely a physical-plan optimization.
    *
    * @param occ    distinct (item, basket) occurrence relation
    * @param item   item key column name
    * @param basket basket key column name
    * @param counts optional precomputed (item, `c`) occurrence counts
    *               covering every item in `occ` (callers usually have
    *               the a-priori frequency table already); computed from
    *               `occ` when absent
    */
  def capPerItem(occ: DataFrame, item: String, basket: String,
                 cap: Long = DefaultCap,
                 counts: Option[DataFrame] = None): DataFrame = {
    require(!occ.columns.contains("graft_cap_rk"),
      "capPerItem emits a transient `graft_cap_rk` — rename the input's")
    val cnts = counts.getOrElse(
      occ.groupBy(col(item)).agg(count(lit(1)).as("c")))
    val hot = cnts.filter(col("c") > cap).select(col(item))
    // Fast path: when NO item exceeds the cap the whole machinery is an
    // identity — skip the fact-sized anti-join + window + union rather
    // than plan them. The isEmpty probe runs the item-count aggregate
    // the broadcast build needed anyway (callers pass `counts` from a
    // cached relation), and at scales where a power-law head exists the
    // probe finds it and the split proceeds as before. Measured warm at
    // sf0.1: q_graph_jaccard 3.4 → 2.1 s, q_market_basket 4.5 → 3.8 s;
    // q_recommend_cooccur unchanged (its cap stage is dominated by the
    // downstream persist write, not the skipped joins).
    if (hot.isEmpty) return occ
    val cold = occ.join(broadcast(hot), Seq(item), "left_anti")
    val w = Window.partitionBy(col(item)).orderBy(
      md5(concat(col(item).cast("string"), lit("_"),
        col(basket).cast("string"))),
      col(basket))
    val hotCapped = occ.join(broadcast(hot), Seq(item), "left_semi")
      .withColumn("graft_cap_rk", row_number().over(w))
      .filter(col("graft_cap_rk") <= cap)
      .drop("graft_cap_rk")
    // restore occ's column order (the joins moved the key first)
    cold.select(occ.columns.map(col): _*)
      .unionByName(hotCapped.select(occ.columns.map(col): _*))
  }

  /** Shared pair-support core for the two basket miners
    * (q_market_basket, q_recommend_cooccur):
    *
    *  - `supHalf` — unordered co-occurrence pairs (part_a < part_b)
    *    with `support` ≥ minSup,
    *  - `freq`    — per-item CAPPED basket count (l_partkey, c) for
    *    the confidence/lift denominators,
    *  - `baskets` — 1-row (n_baskets) relation,
    *  - `release` — unpersists any slow-path hubs; call after sealing.
    *
    * TWO physical shapes behind one semantics, routed by a cheap probe
    * (one slim aggregate over the item column — raw occurrence counts,
    * which upper-bound distinct basket counts):
    *
    * FAST PATH (no item's raw count exceeds the cap, singleton items
    * ≤25% of the vocabulary): ONE fact shuffle builds per-basket
    * item sets (`collect_set` dedupes inside the aggregate, so the
    * separate DISTINCT pass is gone); the basket count is the group
    * count of that same relation and the item frequencies explode off
    * it — all three consumers share the one exchange inside a single
    * plan (AQE exchange reuse), so nothing persists and nothing is
    * computed twice. The a-priori prune is SKIPPED here: omitting it
    * cannot change the output (a pair with support ≥ 2 has both ends
    * in ≥2 baskets, and sub-support items only form sub-support pairs,
    * dropped by the support filter), and with few singletons the extra
    * explode volume is bounded by k·s per basket. Measured warm at
    * sf0.1: 1.75–2.0 s end-to-end vs 2.6–4.1 s for the hub-persisted
    * shape — the persists broke single-plan exchange reuse and cost
    * more than they saved.
    *
    * PRODUCTION PATH (a power-law head or singleton-heavy tail — the
    * normal case at 100 TB): the occurrence-level pipeline — DISTINCT
    * (basket, item) persisted hub, sub-support items pruned BEFORE
    * pairing, hot items clamped by [[capPerItem]] — bounding pair
    * volume by Σ per-basket k² with every item's multiplicity ≤ cap.
    * The probe over-triggers safely (raw ≥ distinct): a spurious trip
    * lands on the slower-but-identical pipeline, and [[capPerItem]]'s
    * own exact probe still fast-paths the cap if no item is truly hot.
    *
    * Relies on non-null basket/item keys (both are FK columns in every
    * caller; `collect_set` drops nulls where DISTINCT would keep them).
    */
  final case class PairCore(supHalf: DataFrame, freq: DataFrame,
                            baskets: DataFrame, release: () => Unit,
                            fast: Boolean)

  def pairCore(occRaw: DataFrame, item: String, basket: String,
               minSup: Long = 2L, cap: Long = DefaultCap): PairCore = {
    val stats = occRaw.groupBy(col(item)).agg(count(lit(1)).as("rc"))
      .agg(max(col("rc")).as("mx"),
        sum(when(col("rc") === 1L, 1L).otherwise(0L)).as("singles"),
        count(lit(1)).as("nitems")).head()
    val mx = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val singles = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val nitems = stats.getLong(2)
    if (mx <= cap && singles * 4L <= nitems) {
      val sets = occRaw.select(col(basket), col(item))
        .groupBy(col(basket))
        .agg(collect_set(col(item)).as("parts"))
      val freq = sets.select(explode(col("parts")).as(item))
        .groupBy(col(item)).agg(count(lit(1)).as("c"))
        .filter(col("c") >= minSup)
        // no hot items, so the capped count IS the count; keep the
        // least() anyway so the two paths read identically downstream
        .select(col(item), least(col("c"), lit(cap)).as("c"))
      val supHalf = sets
        .select(explode(col("parts")).as("part_a"), col("parts"))
        .select(col("part_a"), explode(col("parts")).as("part_b"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSup)
      val baskets0 = sets.agg(count(lit(1)).as("n_baskets"))
      PairCore(supHalf, freq, baskets0, () => (), fast = true)
    } else {
      val items = occRaw.select(col(basket), col(item)).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // freq0 is the small multi-consumer hub (prune broadcast, cap
      // probe, both freq broadcasts); item-count sized, cache ~free
      val freq0 = items.groupBy(col(item)).agg(count(lit(1)).as("c"))
        .filter(col("c") >= minSup)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pruned = items.join(broadcast(freq0.select(col(item))), item)
      // capped is NOT persisted: the pair stage is its only consumer —
      // capPerItem keeps exactly min(c, cap) baskets per item, so the
      // capped per-item frequency is least(c, cap) from freq0 in
      // closed form, no second scan of the capped relation
      val capped = capPerItem(pruned, item, basket, cap,
        counts = Some(freq0))
      val freq = freq0.select(col(item), least(col("c"), lit(cap)).as("c"))
      val supHalf = capped.groupBy(col(basket))
        .agg(collect_list(col(item)).as("parts"))
        .select(explode(col("parts")).as("part_a"), col("parts"))
        .select(col("part_a"), explode(col("parts")).as("part_b"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSup)
      val baskets0 = items.select(col(basket)).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      PairCore(supHalf, freq, baskets0, () => {
        freq0.unpersist(false); items.unpersist(false)
      }, fast = false)
    }
  }

  /** The identical cap as a DuckDB SQL derived table over a CTE named
    * `from` with columns (`item`, `basket`) — keeps the oracle's cap
    * semantics bit-equal to [[capPerItem]] (same md5 key, same
    * tie-break, same boundary). */
  def capSql(from: String, item: String, basket: String,
             cap: Long = DefaultCap): String =
    s"""SELECT $basket, $item FROM (
       |  SELECT $basket, $item,
       |         row_number() OVER (PARTITION BY $item
       |           ORDER BY md5(CAST($item AS VARCHAR) || '_' ||
       |                        CAST($basket AS VARCHAR)), $basket) rk
       |  FROM $from) WHERE rk <= $cap""".stripMargin
}

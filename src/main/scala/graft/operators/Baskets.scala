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
    * @param occ    distinct (item, basket) occurrence relation
    * @param item   item key column name
    * @param basket basket key column name
    */
  def capPerItem(occ: DataFrame, item: String, basket: String,
                 cap: Long = DefaultCap): DataFrame = {
    require(!occ.columns.contains("graft_cap_rk"),
      "capPerItem emits a transient `graft_cap_rk` — rename the input's")
    val w = Window.partitionBy(col(item)).orderBy(
      md5(concat(col(item).cast("string"), lit("_"),
        col(basket).cast("string"))),
      col(basket))
    occ.withColumn("graft_cap_rk", row_number().over(w))
      .filter(col("graft_cap_rk") <= cap)
      .drop("graft_cap_rk")
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

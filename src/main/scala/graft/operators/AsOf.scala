package graft.operators

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J8 as-of join (SURVEY.md §2.3 J8): for each left row, the latest right
  * row at-or-before its timestamp, per key. Spark has no native batch
  * as-of operator; the scalable formulation here is UNION-TAG + WINDOW:
  * tag both sides, union them, and carry the most recent right-side
  * timestamp forward with `last(_, ignoreNulls = true)` over
  * (key ORDER BY ts) — ONE shuffle on the key, linear in input, no
  * pair-wise join blowup. (The naive inequality-join + row_number
  * alternative materializes every candidate pair per left row — quadratic
  * per key at 100 TB; that shape is used only as the DuckDB oracle, as a
  * correlated max subquery.)
  *
  * Tie semantics: a right row at exactly ts == left ts IS visible
  * (`<=`, matching DuckDB ASOF); the union sorts right-side rows before
  * left-side rows at equal ts via the `side` tag.
  */
object AsOf extends QueryModule {

  /** Generic as-of: every `left` row picks up the latest right-side value
    * with right.ts <= left.ts for the same key, as a new column
    * `asofCol`. `keyCol`/`tsCol` must exist on both inputs; `valueCol` on
    * `right`. Single shuffle on the key; linear in |left| + |right|. */
  /** `toleranceMicros`: when set, a right-side match older than the left
    * timestamp by more than the tolerance is discarded (DuckDB
    * `ASOF ... TOLERANCE` semantics) — the carried right-side event time
    * rides along in `__vts` to evaluate the bound after the window. */
  /** `tieCol`: optional right-side column making the pick deterministic
    * when two right rows share (key, ts) — the LARGEST tie value wins
    * (the oracle's `ORDER BY ts DESC, tie DESC LIMIT 1`). Without it,
    * equal-ts right rows tie-break by partition order. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String, asofCol: String,
               toleranceMicros: Option[Long] = None,
               tieCol: Option[String] = None): DataFrame = {
    val valType = right.schema(valueCol).dataType
    val l = left.withColumn("__side", lit(1))
      .withColumn("__val", lit(null).cast(valType))
      .withColumn("__vts", lit(null).cast("long"))
      .withColumn("__tie", lit(null).cast("long"))
    val r = right.select(col(keyCol), col(tsCol), col(valueCol).as("__val"),
        tieCol.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__tie"))
      .withColumn("__side", lit(0))
      .withColumn("__vts", unix_micros(col(tsCol)))
    val extra = left.columns.filterNot(Set(keyCol, tsCol))
      .map(c => col(c)).toIndexedSeq
    val unioned = l.select(
        (Seq(col(keyCol), col(tsCol), col("__side"), col("__val"),
          col("__vts"), col("__tie")) ++ extra): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn(asofCol, last(col("__val"), ignoreNulls = true).over(w))
      .withColumn("__asof_ts", last(col("__vts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceMicros match {
      case Some(tol) => carried.withColumn(asofCol,
        when(unix_micros(col(tsCol)) - col("__asof_ts") <= tol, col(asofCol)))
      case None => carried
    }
    bounded.drop("__side", "__val", "__vts", "__tie", "__asof_ts")
  }

  /** J8 q_join_asof — for each purchase event, the user's most recent
    * prior-or-simultaneous signup timestamp (events↔events; the testdata
    * orders/events time ranges don't overlap, FIXTURES.md). */
  private def qJoinAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = graft.sources.Tables.load(s, dir, "events")
    // side 0 = signup (visible at equal ts), side 1 = purchase.
    val tagged = e.filter($"event_type".isin("signup", "purchase"))
      .select(
        $"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "signup", lit(0)).otherwise(lit(1)).as("side"),
        when($"event_type" === "signup", $"ts").as("signup_ts_src"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"side", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("signup_ts", last($"signup_ts_src", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"signup_ts")
      .orderBy($"event_id")
  }

  /** J8b q_join_asof_tol — the tolerance-bounded as-of join DECLARED
    * (previously API-only): each purchase picks up the value of the
    * user's latest click no older than ONE HOUR (DuckDB `ASOF …
    * TOLERANCE` semantics); a latest-click outside the window yields
    * NULL — and since the latest match is also the closest, no older
    * click can resurrect the row. Same union-tag + single-window plan as
    * J8 (one shuffle on user, no pair blowup); equal-ts clicks break
    * deterministically to the largest event_id via the tie column. */
  private def qJoinAsofTol(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = graft.sources.Tables.load(s, dir, "events")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"value", $"event_id".as("click_id"))
    asOfJoin(purchases, clicks, "user_id", "ts", "value",
      "last_click_value", Some(3600L * 1000000L), Some("click_id"))
      .select($"event_id", $"user_id", $"ts", $"last_click_value")
      .orderBy($"event_id")
  }

  /** q_gapfill_locf — time-series resampling: per-customer monthly
    * revenue re-gridded onto the corpus's full month range, missing
    * months filled by last-observation-carried-forward (the same
    * carry-forward window [[asOfJoin]] is built on — gap-fill IS an
    * as-of join against a generated scaffold). Months before an
    * entity's first observation stay NULL (both engines agree).
    *
    * Scale: the month scaffold is sequence-generated from a broadcast
    * 1-row min/max aggregate (never collected to the driver); scaffold ×
    * entities is dims-sized; the only data-sized work is the revenue
    * aggregate (map-side combined) and one per-entity window — the
    * standard per-key time-series shape, partition-parallel across
    * entities at 100 TB. */
  private def qGapfillLocf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = graft.sources.Tables.load(s, dir, "orders")
    val bounds = orders.agg(
      date_trunc("month", min($"o_orderdate")).as("mn"),
      date_trunc("month", max($"o_orderdate")).as("mx"))
    val months = bounds
      .select(explode(expr("sequence(mn, mx, interval 1 month)")).as("m"))
    val custs = graft.sources.Tables.load(s, dir, "customer")
      .filter($"c_custkey" <= 5).select($"c_custkey")
    val rev = orders.filter($"o_custkey" <= 5)
      .groupBy($"o_custkey", date_trunc("month", $"o_orderdate").as("rm"))
      .agg(graft.Det.sumd($"o_totalprice").as("rev"))
    val w = Window.partitionBy($"c_custkey").orderBy($"m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    custs.crossJoin(months)
      .join(rev, $"c_custkey" === $"o_custkey" && $"m" === $"rm", "left")
      .withColumn("rev_filled", last($"rev", ignoreNulls = true).over(w))
      .select($"c_custkey".as("custkey"), $"m".cast("date").as("month"),
        $"rev_filled", $"rev".isNull.as("is_gap"))
      .orderBy($"custkey", $"month")
  }

  /** q_gapfill_interp — gap fill by LINEAR INTERPOLATION between the
    * nearest observed months (the upgrade of [[qGapfillLocf]] when the
    * series is a level, not a state): filled = prev + (next − prev) ·
    * Δm/Δn from two per-entity windows (carry-forward for the previous
    * observation, carry-backward for the next). Months outside the
    * observed span stay NULL — interpolation never extrapolates.
    *
    * Determinism: Δm/Δn are exact small-integer doubles (month-grid
    * differences) and the fill is the identical left-to-right IEEE
    * expression in both engines; the observed values are already
    * Det.sumd-exact. Scale shape = LOCF's: dims-sized scaffold, one
    * map-combined revenue aggregate, two per-entity windows —
    * partition-parallel across entities. */
  private def qGapfillInterp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = graft.sources.Tables.load(s, dir, "orders")
    val bounds = orders.agg(
      date_trunc("month", min($"o_orderdate")).as("mn"),
      date_trunc("month", max($"o_orderdate")).as("mx"))
    val months = bounds
      .select(explode(expr("sequence(mn, mx, interval 1 month)")).as("m"))
    val custs = graft.sources.Tables.load(s, dir, "customer")
      .filter($"c_custkey" <= 5).select($"c_custkey")
    val rev = orders.filter($"o_custkey" <= 5)
      .groupBy($"o_custkey", date_trunc("month", $"o_orderdate").as("rm"))
      .agg(graft.Det.sumd($"o_totalprice").as("rev"))
    val wb = Window.partitionBy($"c_custkey").orderBy($"m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy($"c_custkey").orderBy($"m")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    custs.crossJoin(months)
      .join(rev, $"c_custkey" === $"o_custkey" && $"m" === $"rm", "left")
      .withColumn("pv", last($"rev", ignoreNulls = true).over(wb))
      .withColumn("pm", last(when($"rev".isNotNull, $"m"), ignoreNulls = true).over(wb))
      .withColumn("nv", first($"rev", ignoreNulls = true).over(wf))
      .withColumn("nm", first(when($"rev".isNotNull, $"m"), ignoreNulls = true).over(wf))
      .withColumn("rev_filled",
        when($"rev".isNotNull, $"rev")
          .otherwise($"pv" + ($"nv" - $"pv") *
            (months_between($"m", $"pm") / months_between($"nm", $"pm"))))
      .select($"c_custkey".as("custkey"), $"m".cast("date").as("month"),
        $"rev_filled", $"rev".isNull.as("is_gap"))
      .orderBy($"custkey", $"month")
  }

  val queries: Map[String, Q] = Map(
    "q_join_asof" -> (qJoinAsof _),
    "q_join_asof_tol" -> (qJoinAsofTol _),
    "q_gapfill_locf" -> (qGapfillLocf _),
    "q_gapfill_interp" -> (qGapfillInterp _))

  val oracles: Map[String, String] = Map(
    "q_gapfill_locf" ->
      s"""WITH bounds AS (
           SELECT date_trunc('month', min(o_orderdate)) mn,
                  date_trunc('month', max(o_orderdate)) mx FROM orders),
         months AS (
           SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) m
           FROM bounds),
         custs AS (SELECT c_custkey FROM customer WHERE c_custkey <= 5),
         rev AS (
           SELECT o_custkey, date_trunc('month', o_orderdate) m,
                  ${graft.Det.SUMD("o_totalprice")} rev
           FROM orders WHERE o_custkey <= 5 GROUP BY 1, 2)
         SELECT s.c_custkey AS custkey, CAST(s.m AS DATE) AS month,
                last_value(r.rev IGNORE NULLS) OVER (
                  PARTITION BY s.c_custkey ORDER BY s.m
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS rev_filled,
                r.rev IS NULL AS is_gap
         FROM (SELECT c_custkey, m FROM custs CROSS JOIN months) s
         LEFT JOIN rev r ON r.o_custkey = s.c_custkey AND r.m = s.m
         ORDER BY custkey, month""",
    "q_gapfill_interp" ->
      s"""WITH bounds AS (
           SELECT date_trunc('month', min(o_orderdate)) mn,
                  date_trunc('month', max(o_orderdate)) mx FROM orders),
         months AS (
           SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) m
           FROM bounds),
         custs AS (SELECT c_custkey FROM customer WHERE c_custkey <= 5),
         rev AS (
           SELECT o_custkey, date_trunc('month', o_orderdate) m,
                  ${graft.Det.SUMD("o_totalprice")} rev
           FROM orders WHERE o_custkey <= 5 GROUP BY 1, 2),
         j AS (
           SELECT s.c_custkey, s.m, r.rev
           FROM (SELECT c_custkey, m FROM custs CROSS JOIN months) s
           LEFT JOIN rev r ON r.o_custkey = s.c_custkey AND r.m = s.m),
         w AS (
           SELECT c_custkey, m, rev,
             last_value(rev IGNORE NULLS) OVER (
               PARTITION BY c_custkey ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
             last_value(CASE WHEN rev IS NOT NULL THEN m END IGNORE NULLS)
               OVER (PARTITION BY c_custkey ORDER BY m
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pm,
             first_value(rev IGNORE NULLS) OVER (
               PARTITION BY c_custkey ORDER BY m
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nv,
             first_value(CASE WHEN rev IS NOT NULL THEN m END IGNORE NULLS)
               OVER (PARTITION BY c_custkey ORDER BY m
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nm
           FROM j)
         SELECT c_custkey AS custkey, CAST(m AS DATE) AS month,
                CASE WHEN rev IS NOT NULL THEN rev
                     ELSE pv + (nv - pv) *
                          (CAST(date_diff('month', pm, m) AS DOUBLE)
                           / CAST(date_diff('month', pm, nm) AS DOUBLE)) END
                  AS rev_filled,
                rev IS NULL AS is_gap
         FROM w ORDER BY custkey, month""",
    "q_join_asof_tol" ->
      """SELECT e.event_id, e.user_id, e.ts,
                (SELECT c.value FROM events c
                 WHERE c.event_type = 'click' AND c.user_id = e.user_id
                   AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1)
                  AS last_click_value
         FROM events e
         WHERE e.event_type = 'purchase'
         ORDER BY e.event_id""",
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, e.ts,
                (SELECT max(s.ts) FROM events s
                 WHERE s.event_type = 'signup'
                   AND s.user_id = e.user_id AND s.ts <= e.ts) AS signup_ts
         FROM events e
         WHERE e.event_type = 'purchase'
         ORDER BY e.event_id""")
}

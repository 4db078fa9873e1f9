package graft.operators

import graft.{Det, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Warehouse analytics (north-star §2 extensions beyond the reference's
  * observed surface): cohort retention, range-frame rolling windows,
  * SCD-2 interval construction, and z-score anomaly flagging — the OLAP
  * shapes a data team runs NEXT to a curation pipeline (usage analytics
  * over the `events` stream, order-book rollups over `orders`).
  *
  * Scale posture: every query here is one or two key-partitioned
  * shuffles (per-user / per-customer / per-type); group stats that fan
  * back onto fact rows travel by `broadcast` (G rows, G = #groups);
  * windows share one partitioning so Catalyst plans a single Exchange.
  * Determinism follows the repo-wide t2 discipline: integer month
  * indexes, DECIMAL-exact sums ([[Det]]), quantized doubles before any
  * power sum, `Det.round6` on every emitted rational.
  */
object Analytics extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q_retention_cohort — classic cohort retention over the order book
    * (orders span ~80 months in the testdata; the events stream spans
    * only one, so customers cohort, events don't): customers cohorted
    * by the month of their FIRST order; for each (cohort, months-since)
    * cell, how many cohort members ordered again. The month key is an
    * integer index (year·12 + month−1) so cohort arithmetic never
    * touches engine-specific date intervals; the emitted retention
    * ratio is an exact-int division rounded via [[Det.round6]].
    *
    * Plan: first-touch is a map-side-combinable min per customer,
    * PERSISTED — it has two consumers (the activity join and the cohort
    * sizes), and without the cache each would replan its own full
    * orders scan + aggregate (the q_tfidf round-2 lesson); cohort sizes
    * are a G-row aggregate joined back by broadcast. At 100 TB the
    * cached relation is customer-sized (not fact-sized), and the work
    * is two narrow orders passes (the first-touch build and the
    * activity join — a fact-sized cache that would fuse them is exactly
    * what a 100 TB plan must not assume) + one customer-keyed and one
    * cell-keyed shuffle, all combinable. */
  private def qRetentionCohort(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val midx =
      (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).cast("long")
    val e = t(s, dir, "orders").select($"o_custkey", midx.as("midx"))
    val first = e.groupBy($"o_custkey").agg(min($"midx").as("cidx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = first.groupBy($"cidx").agg(count(lit(1)).as("cohort_size"))
      e.join(first, "o_custkey")
        .groupBy($"cidx", ($"midx" - $"cidx").as("months_since"))
        .agg(countDistinct($"o_custkey").as("n_active"))
        .join(broadcast(sizes), "cidx")
        .select(
          make_date(expr("CAST(cidx div 12 AS INT)"),
            (($"cidx" % 12) + 1).cast("int"), lit(1)).as("cohort_month"),
          $"months_since", $"n_active", $"cohort_size",
          Det.round6($"n_active".cast(DoubleType) / $"cohort_size")
            .as("retention"))
        .orderBy($"cohort_month", $"months_since")
        .transform(graft.Exec.seal)
    } finally first.unpersist(false)
  }

  /** q_window_range — RANGE-frame rolling aggregate: per-customer
    * 30-day trailing revenue and order count, the time-windowed rollup
    * a RANGE frame exists for (a ROWS frame miscounts when a customer
    * places several orders on one day — peers must enter the frame
    * together). The frame is keyed on an integer epoch-day so both
    * engines bound it identically, and the windowed sum runs in exact
    * DECIMAL ([[Det]] discipline applied to a window), so tied-day
    * peer order can't shift a bit.
    *
    * Plan: one Exchange on o_custkey feeding a single sort+window; at
    * 100 TB the frame is bounded (30 days) so state per key is O(orders
    * in 30 days), never the whole history. */
  private def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = DecimalType(18, 4)
    val day = datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
      .cast("long")
    val w = Window.partitionBy($"o_custkey").orderBy($"day")
      .rangeBetween(-29, 0)
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", day.as("day"), $"o_totalprice")
      .withColumn("rev_30d",
        sum($"o_totalprice".cast(dec)).over(w).cast(dec).cast(DoubleType))
      .withColumn("n_orders_30d", count(lit(1)).over(w))
      .select($"o_orderkey", $"o_custkey", $"day", $"rev_30d", $"n_orders_30d")
      .orderBy($"o_orderkey", $"o_custkey", $"day", $"rev_30d", $"n_orders_30d")
  }

  /** q_scd2 — slowly-changing-dimension type-2 construction from an
    * event stream: per user, collapse consecutive equal event_types and
    * emit validity intervals [valid_from, valid_to) with a version
    * number — the standard "dimension history from CDC" op. Change
    * detection (lag) and interval close (lead over the changes) share
    * one partitioning+ordering, so Catalyst plans ONE Exchange and two
    * stacked Window operators. Ordering is (ts, event_id) — event_id
    * breaks timestamp ties, making lag/lead deterministic under the
    * hash gate. valid_to is NULL on each user's current (open) row. */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"event_type")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select($"user_id", $"version", $"event_type",
        $"ts".as("valid_from"), $"valid_to")
      .orderBy($"user_id", $"version")
  }

  /** q_outliers — per-group z-score anomaly flags over events.value
    * (exponential-shaped in the testdata, so the 2σ tail is non-empty).
    * The [[Relational.qCorr]] exactness discipline: value is half-up
    * quantized to 1e-4 per row (exact in both engines), power sums
    * accumulate in DECIMAL(38,0)/HUGEINT, and mean/σ come out of the
    * SAME closed-form double ops in both engines — so z is bit-identical
    * and the |z| > 2 cut can't straddle engines. σ is the population
    * form (÷n): the filter is a profiling cut, not an estimator.
    *
    * Plan: G-row stats aggregate (map-side combined), broadcast back
    * onto the fact scan, pure codegen'd filter — TWO passes over the
    * fact (the stats pass and the flagging pass), which is optimal at
    * 100 TB: the only single-pass alternative caches the fact itself,
    * and a fact-sized cache is exactly what a 100 TB plan must not
    * assume. */
  private def qOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val xq = floor($"value" * 10000.0 + 0.5).cast("long")
    val st = t(s, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(xq.cast("decimal(28,0)")).as("sx"),
        sum((xq * xq).cast("decimal(28,0)")).as("sx2"))
    val nD = $"n".cast(dec)
    val mean = ($"sx".cast(dec).cast(DoubleType)) / $"n".cast(DoubleType)
    val variance =
      (nD * $"sx2".cast(dec) - $"sx".cast(dec) * $"sx".cast(dec))
        .cast(DoubleType) / (nD * nD).cast(DoubleType)
    val z = (xq.cast(DoubleType) - mean) / sqrt(variance)
    t(s, dir, "events")
      .join(broadcast(st), "event_type")
      .withColumn("z", z)
      .filter(abs($"z") > 2.0)
      .select($"event_id", $"event_type", $"value",
        Det.round6($"z").as("zscore"))
      .orderBy($"event_id")
  }

  /** q_sessionize — batch sessionization: group each user's events into
    * sessions separated by >6h of inactivity (the gaps-and-islands
    * pattern; the batch twin of the streaming session window in
    * [[graft.streaming.StreamOps]]). Gap detection compares integer
    * epoch-MICROsecond deltas (`unix_micros` ≡ DuckDB `epoch_us`) so
    * the threshold cut is exact in both engines; (ts, event_id)
    * ordering pins tie order.
    *
    * Plan: lag-flag and running-sum session ids share ONE
    * partitioning+ordering (single Exchange, stacked windows), then the
    * per-session rollup is a map-side-combinable groupBy on
    * (user, session) — the same keys the window already clustered, so
    * AQE coalesces rather than reshuffles. Per-user state at 100 TB is
    * the window sort, partition-parallel across users. */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gapUs = 6L * 3600 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id",
        unix_micros($"ts").as("us"))
      .withColumn("new_s",
        when(lag($"us", 1).over(w).isNull ||
          $"us" - lag($"us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_s").over(run))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"session_id")
  }

  /** q_range_join_binned — the 100 TB execution path for interval joins:
    * every event inside each error-incident window (error ts ± 5 min),
    * rolled up per incident. [[Relational]]'s `q_join_theta_range` keeps
    * the textbook plan — BroadcastNestedLoopJoin — which is right ONLY
    * while one side stays broadcastable; an incident table derived from
    * the event stream grows WITH the stream, so at 100 TB that plan is
    * O(N·M) against two fact-sized inputs. The standard fix (Databricks
    * range-join binning, Flink interval joins): quantize time into
    * fixed-width bins as wide as the interval, explode each interval to
    * the ≤2 bins it overlaps, map each point to its single bin, and join
    * on the bin as a plain shuffle equi-join, re-checking the exact
    * predicate after the match. Work is O((N + 2M) + output) with both
    * sides hash-partitioned — no broadcast, no nested loop, AQE handles
    * hot bins like any skewed shuffle key.
    *
    * Points carry exactly ONE bin, so a (point, interval) pair can meet
    * in at most one bin — no post-join dedup. All bounds are integer
    * epoch-µs (`unix_micros` ≡ DuckDB `epoch_us`) so the window edges cut
    * identically in both engines; the oracle runs the naive range join.
    * Every window contains its own error event, so output rows = #errors. */
  private def qRangeJoinBinned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val halfUs = 300L * 1000000 // ±5 min, in epoch-µs
    // bin width = interval width (600 s): each interval overlaps 1–2 bins
    val ev = t(s, dir, "events")
    val wins = ev.filter($"event_type" === "error")
      .select($"event_id".as("wid"),
        (unix_micros($"ts") - halfUs).as("lo_us"),
        (unix_micros($"ts") + halfUs).as("hi_us"))
      .withColumn("bin",
        explode(expr("sequence(lo_us div 600000000, (hi_us - 1) div 600000000)")))
    val pts = ev.select($"event_id", $"value", unix_micros($"ts").as("e_us"))
      .withColumn("bin", expr("e_us div 600000000"))
    pts.join(wins, "bin")
      .filter($"e_us" >= $"lo_us" && $"e_us" < $"hi_us")
      .groupBy($"wid")
      .agg(count(lit(1)).as("n_events"), Det.sumd($"value").as("val_sum"))
      .orderBy($"wid")
  }

  /** q_winsorize — per-group p05/p95 winsorized clipping of
    * events.value, the robust-statistics companion to [[qOutliers]]'s
    * z-cut (clipping beats dropping when downstream wants every row).
    * The percentiles are EXACT order statistics at integer ranks
    * ⌈0.05n⌉/⌈0.95n⌉ computed WITHOUT sorting the fact: values are
    * half-up quantized to 1e-4 BIGINTs, aggregated to a per-group value
    * HISTOGRAM (map-side combined, G×V rows), and the rank is selected
    * by the same TWO-LEVEL bucketed selection as [[qRfm]] — per-(group,
    * bucket) summaries + an exclusive prefix under a window over ≤B
    * rows per group, then a (group, bucket)-partitioned within-bucket
    * cumulative — so even a group whose value histogram alone is huge
    * never funnels through one task. Rank arithmetic is pure integer
    * ((n·5+99) div 100 ≡ ceil) and the clip happens on the quantized
    * BIGINTs, so the bounds and the clipped set are bit-identical in
    * both engines; bounds broadcast back onto one fact pass (two fact
    * passes total — the [[qOutliers]] no-fact-cache posture). */
  private def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xq = floor($"value" * 10000.0 + 0.5).cast("long")
    val e = t(s, dir, "events")
      .select($"event_id", $"event_type", $"value", xq.as("xq"))
    val h = e.groupBy($"event_type", $"xq").agg(count(lit(1)).as("cnt"))
    val bounds = Selection.withRankCum(h, Seq("event_type"), "xq", "cnt")
      .groupBy($"event_type").agg(
        min(when($"cum" >= expr("(n * 5 + 99) div 100"), $"xq")).as("lo"),
        min(when($"cum" >= expr("(n * 95 + 99) div 100"), $"xq")).as("hi"))
    e.join(broadcast(bounds), "event_type")
      .select($"event_id", $"event_type", $"value",
        (least(greatest($"xq", $"lo"), $"hi").cast("double") / 10000.0)
          .as("value_w"),
        ($"xq" < $"lo" || $"xq" > $"hi").as("clipped"))
      .orderBy($"event_id")
  }

  /** q_skyline — 2-D Pareto frontier (skyline operator, Börzsönyi et al.
    * 2001) over parts: maximize retail price, minimize size; a part
    * survives iff no other part is at least as good on both axes and
    * strictly better on one. The multi-criteria "best offers" shape that
    * otherwise needs an O(N²) self-join.
    *
    * Plan: dominance only depends on per-PRICE-LEVEL minima, so the fact
    * collapses to a level table first (map-side combined); a running min
    * over strictly-higher price levels decides strict-price dominance
    * and the level's own min decides equal-price dominance; levels
    * broadcast back onto one fact pass. The running min is a TWO-LEVEL
    * bucketed prefix (prefix-min is associative): constant-B price-range
    * buckets, exclusive prefix-min over the ≤B bucket minima (single-
    * partition work bounded by a constant), then a bucket-PARTITIONED
    * within-bucket prefix-min — so even a huge price-level cardinality
    * never funnels through one task. Pure comparisons on raw values — no
    * arithmetic, so cross-engine determinism is free. */
  private def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = t(s, dir, "part").select($"p_partkey", $"p_retailprice", $"p_size")
    val B = 4096L
    val lvl0 = p.groupBy($"p_retailprice").agg(min($"p_size").as("msz"))
    val mm = lvl0.agg(min($"p_retailprice").as("lo"),
      max($"p_retailprice").as("hi"))
    // bucket 0 = highest prices, so bucket-ascending == price-descending
    // (shared monotone bucket math — Selection.bucketExpr on the NEGATED
    // price, so the overflow/null/degenerate-range handling lives once)
    val lb = lvl0.crossJoin(broadcast(mm))
      .withColumn("bucket", Selection.bucketExpr(
        -$"p_retailprice", -$"hi", -$"lo", B))
    val wOffB = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = lb.groupBy($"bucket").agg(min($"msz").as("bmin"))
      .withColumn("prevb", min($"bmin").over(wOffB))
      .select($"bucket", $"prevb")
    val wv = Window.partitionBy($"bucket").orderBy($"p_retailprice".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val lvl = lb.join(broadcast(boff), "bucket")
      // least() skips NULLs: null prefix on both levels ⇒ null prevmin
      .withColumn("prevmin", least($"prevb", min($"msz").over(wv)))
      .select($"p_retailprice", $"msz", $"prevmin")
    p.join(broadcast(lvl), Seq("p_retailprice"))
      .filter(!($"prevmin".isNotNull && $"prevmin" <= $"p_size") &&
        !($"msz" < $"p_size"))
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .orderBy($"p_partkey")
  }

  /** q_attribution — last-touch marketing attribution over the event
    * stream: each purchase is credited to the user's most recent
    * PRECEDING non-purchase event (the "channel" that got the user
    * there) — the conversion-attribution query every event warehouse
    * runs. One user-keyed Exchange; both attribution columns share the
    * same window frame (unbounded-preceding → 1-preceding `last` with
    * IGNORE NULLS), so Catalyst plans a single Window over a single
    * sort; no value arithmetic, so determinism needs only the (ts,
    * event_id) total order inside the frame. Purchases with no prior
    * touch credit to '(none)' with a NULL touch id. */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      // both window columns in ONE select so Catalyst plans a single
      // Window operator (separate withColumns left two sort passes)
      .select($"event_id", $"user_id", $"event_type", $"value",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w).as("touch_type"),
        last(when($"event_type" =!= "purchase", $"event_id"),
          ignoreNulls = true).over(w).as("touch_id"))
      .filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"value",
        coalesce($"touch_type", lit("(none)")).as("channel"), $"touch_id")
      .orderBy($"purchase_id")
  }

  /** The lineitem columns q_data_profile covers, with each column's
    * engine-agnostic string rendering: integers cast directly, doubles
    * through DECIMAL(18,4) (fixed scale — both engines print "10.0000";
    * a raw double-to-string cast is formatter-specific), timestamps
    * through an explicit pattern. Shared by the Spark query and the
    * generated oracle so the two can never drift. */
  private val ProfileCols: Seq[(String, Column => Column, String => String)] =
    Seq(
      ("l_orderkey", (c: Column) => c.cast("string"),
        (e: String) => s"CAST($e AS VARCHAR)"),
      ("l_linenumber", (c: Column) => c.cast("string"),
        (e: String) => s"CAST($e AS VARCHAR)"),
      ("l_quantity",
        (c: Column) => c.cast(DecimalType(18, 4)).cast("string"),
        (e: String) => s"CAST(CAST($e AS DECIMAL(18,4)) AS VARCHAR)"),
      ("l_returnflag", (c: Column) => c, (e: String) => e),
      ("l_linestatus", (c: Column) => c, (e: String) => e),
      ("l_shipdate",
        (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss"),
        (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"))

  /** q_data_profile — the data-card/profiling operator (the Deequ/
    * `df.summary()` shape a pipeline runs before training on a new
    * snapshot): per column, row count, null count, exact distinct count,
    * min/max, and mean rendered length — in ONE fact pass. Numeric
    * min/max are computed on the RAW column (then rendered), so "10"
    * never sorts above "9".
    *
    * Plan: a single aggregate over the scan computes all 6 columns'
    * stats at once; the multiple COUNT(DISTINCT)s plan as one Expand
    * (6× map-side row multiplication, the standard profiler trade) into
    * a map-side-combined aggregate whose shuffle carries distinct
    * values, not rows; the 1-row result then explodes to the long form
    * driver-side-free. At 100 TB the Expand factor is the knob: drop to
    * approx_count_distinct per column when exactness isn't contractual.
    * Determinism: counts and min/max are exact; mean length is one
    * division of exact integers. */
  private def qDataProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.zipWithIndex.flatMap {
      case ((name, fmt, _), i) =>
        val c = col(name)
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_$i"),
          count_distinct(c).as(s"dist_$i"),
          fmt(min(c)).as(s"min_$i"),
          fmt(max(c)).as(s"max_$i"),
          sum(length(fmt(c))).as(s"len_$i"),
          count(c).as(s"nn_$i"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ProfileCols.zipWithIndex.map {
        case ((name, _, _), i) =>
          struct(
            lit(name).as("column_name"),
            $"n_rows",
            col(s"nulls_$i").as("n_nulls"),
            col(s"dist_$i").as("n_distinct"),
            col(s"min_$i").as("min_value"),
            col(s"max_$i").as("max_value"),
            ($"len_$i".cast(DoubleType) / $"nn_$i").as("avg_len"))
      }: _*)).as("p"))
      .select($"p.*")
      .orderBy($"column_name")
  }

  /** q_rolling_distinct — trailing 7-day distinct active users per day
    * (the DAU/WAU overlap metric): for every day with events, how many
    * distinct users were active in [day−6, day]. Neither engine's
    * window machinery helps at scale — `COUNT(DISTINCT) OVER RANGE`
    * either doesn't exist (Spark) or re-scans the frame per row — so
    * the scalable formulation makes the DISTINCT structural: dedupe to
    * (user, activity-day), then per user emit each covered day EXACTLY
    * once by capping every activity's coverage interval at the next
    * activity (lead): [a, min(a+6, next−1)] are disjoint per user and
    * union to precisely the covered set, so the final count is a plain
    * COUNT(*), never a distinct over an exploded product.
    *
    * Plan: fact collapses to the (user, day) activity relation first
    * (map-side combined); one user-keyed Exchange for the lead; the
    * ≤7× explode runs map-side; the observed-days dim (≈30 rows)
    * broadcasts; final day-keyed aggregate is combinable. At 100 TB
    * every shuffle carries activity-granularity rows, not events. */
  private def qRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val day = datediff($"ts".cast("date"), to_date(lit("1970-01-01")))
      .cast("long")
    val acts = t(s, dir, "events")
      .select($"user_id", day.as("day"))
      .distinct()
    val days = acts.select($"day").distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    acts
      .withColumn("nxt", lead($"day", 1).over(w))
      .select($"user_id", explode(expr(
        "sequence(day, least(day + 6, coalesce(nxt - 1, day + 6)))"))
        .as("d"))
      .join(broadcast(days.withColumnRenamed("day", "d")), "d")
      .groupBy($"d".as("day"))
      .agg(count(lit(1)).as("n_active_7d"))
      .select($"day", $"n_active_7d")
      .orderBy($"day")
  }

  /** q_event_transitions — first-order Markov transition matrix over
    * per-user event sequences: count and probability of each
    * (event_type → next event_type) step, the session-flow /
    * next-action model every product-analytics stack fits. One
    * user-keyed Exchange feeds the lead; pair counts are map-side
    * combined to a T²-row table (T = #event types) whose per-source
    * totals come from a window over those T² rows — never a second
    * fact pass. Probability is one exact-integer division via
    * [[Det.round6]]; (ts, event_id) ordering pins tie order under the
    * hash gate. */
  private def qEventTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wsrc = Window.partitionBy($"src")
    t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("dst", lead($"event_type", 1).over(w))
      .filter($"dst".isNotNull)
      .groupBy($"event_type".as("src"), $"dst")
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p",
        Det.round6($"n_trans".cast(DoubleType) / sum($"n_trans").over(wsrc)))
      .select($"src", $"dst", $"n_trans", $"p")
      .orderBy($"src", $"dst")
  }

  /** q_ohlc_resample — time-series downsampling to 15-minute bars per
    * event type: open/close (first/last value in the bar), low/high,
    * event count, and exact value sum — the resample/OHLC operator every
    * metrics store and market-data pipeline runs to turn a raw stream
    * into fixed-cadence series. Open/close use the [[Relational]]
    * argmax discipline: min/max over the (µs, event_id, value) STRUCT —
    * the unique (µs, event_id) prefix decides lexicographic order, so
    * tie handling is deterministic and the value payload rides along
    * untouched (no arithmetic ⇒ free cross-engine exactness); the bar
    * key is integer epoch-µs division. One map-side-combined aggregate,
    * one (type, bar)-keyed Exchange — first/last NEVER plan a window
    * over the fact. */
  private def qOhlcResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", unix_micros($"ts").as("us"), $"event_id", $"value")
      .withColumn("bar", expr("us div 900000000") * 900L)
      .groupBy($"event_type", $"bar")
      .agg(
        min(struct($"us", $"event_id", $"value")).getField("value").as("px_open"),
        max(struct($"us", $"event_id", $"value")).getField("value").as("px_close"),
        min($"value").as("px_low"), max($"value").as("px_high"),
        count(lit(1)).as("n_events"), Det.sumd($"value").as("val_sum"))
      .orderBy($"event_type", $"bar")
  }

  /** q_rfm — RFM customer segmentation (recency / frequency / monetary)
    * over the order book, each dimension scored 1–4 by population
    * quartile. The textbook plan ranks customers three times with a
    * GLOBAL ntile — an unpartitioned window that funnels every row
    * through one task, the canonical 100 TB scale-killer. Instead the
    * quartile BOUNDARIES are exact ⌈n/4⌉-rank order statistics,
    * SIZE-ROUTED via [[rfmBounds]] (≤100 k customers → one
    * sorted-collect aggregate; above → two-level bucketed
    * [[Selection]] over per-metric value histograms, where no window
    * ever sees more than max(B, values-per-bucket) rows in one
    * partition), broadcast back onto one customer pass. Scores are "1 + #
    * boundaries strictly below" — equal metric values always land in
    * the same class (ntile would split ties by physical row order).
    * Monetary sums are exact DECIMAL; recency is integer days from the
    * corpus's max order date (computed, not wall clock — [[Det]]
    * discipline: nothing depends on run time). */
  private def qRfm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val day = datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
      .cast("long")
    val cust = t(s, dir, "orders")
      .select($"o_custkey", day.as("day"),
        floor($"o_totalprice" * 10000.0 + 0.5).cast("long").as("pq"))
      .groupBy($"o_custkey")
      .agg(max($"day").as("lastd"), count(lit(1)).as("fq"), sum($"pq").as("mq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val anchor = cust.agg(max($"lastd").as("maxd"))
      val base = cust.crossJoin(broadcast(anchor))
        .select($"o_custkey", ($"maxd" - $"lastd").as("rq"), $"fq", $"mq")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // Exact quartile boundaries of ALL THREE metrics, SIZE-ROUTED
        // ([[rfmBounds]]): at fixture scale one sorted-collect aggregate,
        // at deployment scale the two-level bucketed Selection. The
        // route keys on the memoized customer-table footer count (the
        // [[graft.Exec.sizedHub]] probe discipline — distinct order
        // custkeys are FK-bounded by it).
        val mv = base.select(explode(map(
          lit("rq"), $"rq", lit("fq"), $"fq", lit("mq"), $"mq"))
          .as(Seq("metric", "v")))
        val qb = rfmBounds(mv, small = Tables.rowCount(s, dir, "customer")
          <= graft.Exec.HubPersistThreshold)
        // fold the 3 boundary rows into one broadcastable struct row
        def pick(m: String) = max(when($"metric" === m,
          struct($"b1", $"b2", $"b3"))).as(s"${m}_b")
        val bounds = qb.agg(pick("rq"), pick("fq"), pick("mq"))
        def score(metric: String, desc: Boolean): Column = {
          val b = col(s"${metric}_b")
          val raw = lit(1) +
            when(col(metric) > b.getField("b1"), 1).otherwise(0) +
            when(col(metric) > b.getField("b2"), 1).otherwise(0) +
            when(col(metric) > b.getField("b3"), 1).otherwise(0)
          // recency: smaller = better → invert so 4 is always "best"
          (if (desc) lit(5) - raw else raw).cast("long")
        }
        base
          .crossJoin(broadcast(bounds))
          .select($"o_custkey",
            $"rq".as("recency_days"), $"fq".as("frequency"),
            ($"mq".cast("double") / 10000.0).as("monetary"),
            score("rq", desc = true).as("r_score"),
            score("fq", desc = false).as("f_score"),
            score("mq", desc = false).as("m_score"))
          .withColumn("segment",
            concat($"r_score", $"f_score", $"m_score"))
          .orderBy($"o_custkey")
          .transform(graft.Exec.seal)
      } finally base.unpersist(false)
    } finally cust.unpersist(false)
  }

  /** Size-routed exact ⌈kn/4⌉-rank quartile boundary selection over the
    * unpivoted (metric, v) long relation — the q_rfm seam the round-9
    * verdict asked for. Both routes compute the IDENTICAL order
    * statistic (the r-th smallest value at r = (n·k+3) div 4, i.e. the
    * min v whose ≤-cumulative reaches r), so routing is a physical
    * choice only ([[AnalyticsSpec]] pins cross-route bit-equality on
    * the fixture's real metric vectors).
    *
    *  - `small = true` (customers ≤ [[graft.Exec.HubPersistThreshold]]):
    *    ONE `sort_array(collect_list)` aggregate per metric — three
    *    groups, each sorting ≤threshold longs (≤0.8 MB) in one task.
    *    No window chain, no bucket levels, no seals: at fixture scale
    *    the Selection machinery's ~10 tiny stages were pure stage
    *    latency (44× DuckDB on a 15 k-customer relation).
    *  - `small = false` (the 100 TB shape): the two-level bucketed
    *    [[Selection.withRankCum]] over the value histogram — no task
    *    ever holds a metric's full population, which is exactly what
    *    the collect_list route cannot promise at scale. */
  private[graft] def rfmBounds(mv: DataFrame, small: Boolean): DataFrame = {
    if (small) {
      def rk(k: Int) = expr(s"cast((graft_rfm_n * $k + 3) div 4 as int)")
      mv.groupBy(col("metric"))
        .agg(sort_array(collect_list(col("v"))).as("graft_rfm_vs"),
          count(lit(1)).as("graft_rfm_n"))
        .select(col("metric"),
          element_at(col("graft_rfm_vs"), rk(1)).as("b1"),
          element_at(col("graft_rfm_vs"), rk(2)).as("b2"),
          element_at(col("graft_rfm_vs"), rk(3)).as("b3"))
    } else {
      // the monetary metric is a per-customer DECIMAL sum, near-unique,
      // so a global cumulative window over its value histogram would
      // funnel ~|customers| rows through one task — the bucketed
      // Selection keeps every window partition ≤ max(B, rows-per-bucket)
      val h = mv.groupBy(col("metric"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      Selection.withRankCum(h, Seq("metric"), "v", "cnt")
        .groupBy(col("metric")).agg(
          min(when(col("cum") >= expr("(n * 1 + 3) div 4"), col("v"))).as("b1"),
          min(when(col("cum") >= expr("(n * 2 + 3) div 4"), col("v"))).as("b2"),
          min(when(col("cum") >= expr("(n * 3 + 3) div 4"), col("v"))).as("b3"))
    }
  }

  /** q_ab_test — per-event-type Welch two-sample t statistic between the
    * user-parity variants (user_id % 2 — the deterministic stand-in for
    * an experiment assignment column): the experimentation readout every
    * analytics stack serves next to its funnels. ONE scan, conditional
    * power sums per variant combined map-side; the t formula runs on
    * G rows after the exchange.
    *
    * Determinism ([[Det]] discipline): `value` is half-up-quantized to
    * 1e-4 BIGINTs, so Σx and Σx² are exact integers (Σx² < 2⁶³ until
    * ~10⁶ rows/group at this value range — the [[qAggStats]] DECIMAL
    * widening applies beyond); means/variances are single
    * correctly-rounded IEEE ops off those integers, identical bits in
    * both engines, and the t statistic itself is round6'd. */
  private def qAbTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = floor($"value" * 10000.0 + 0.5).cast("long")
    val isA = $"user_id" % 2 === 0
    def pw(cond: Column, e: Column) = sum(when(cond, e).otherwise(lit(0L)))
    val agg = t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        pw(isA, lit(1L)).as("n_a"), pw(!isA, lit(1L)).as("n_b"),
        pw(isA, v).as("sx_a"), pw(!isA, v).as("sx_b"),
        pw(isA, v * v).as("sx2_a"), pw(!isA, v * v).as("sx2_b"))
    def meanOf(sx: Column, n: Column): Column =
      sx.cast(DoubleType) / (n * lit(10000.0))
    def varOf(n: Column, sx: Column, sx2: Column): Column = {
      val (nD, sxD, sx2D) = (n.cast(DecimalType(19, 0)),
        sx.cast(DecimalType(19, 0)), sx2.cast(DecimalType(19, 0)))
      (nD * sx2D - sxD * sxD).cast(DoubleType) /
        ((nD * (nD - lit(1))).cast(DoubleType) * lit(100000000.0))
    }
    val (ma, mb) = (meanOf($"sx_a", $"n_a"), meanOf($"sx_b", $"n_b"))
    val (va, vb) = (varOf($"n_a", $"sx_a", $"sx2_a"),
      varOf($"n_b", $"sx_b", $"sx2_b"))
    agg
      .filter($"n_a" >= 2 && $"n_b" >= 2)
      .select(
        $"event_type", $"n_a", $"n_b",
        ma.as("mean_a"), mb.as("mean_b"),
        Det.round6((ma - mb) /
          sqrt(va / $"n_a".cast(DoubleType) + vb / $"n_b".cast(DoubleType)))
          .as("t_welch"))
      .orderBy($"event_type")
  }

  /** q_rolling_ema — exponentially-decayed rolling average (α = 1/2, 8
    * taps) of each event-type's value series: the trend-smoothing
    * primitive next to [[qOhlcResample]]'s bars. A TRUE EMA is a serial
    * recurrence (state_t = f(state_{t−1})) — unbounded lookback, the
    * anti-pattern at scale; the 8-tap truncation keeps >99% of the mass
    * (2⁻⁸ tail) and becomes ONE window pass: 8 `lag` taps share a single
    * (type, ts) sort, no self-join, no 8× row blowup.
    *
    * Determinism: tap weights are the exact integers 2^(7−i), values are
    * 1e-4-quantized BIGINTs, so numerator and the present-tap weight sum
    * are exact integer folds; one final double division. Missing taps
    * (series heads) drop out of BOTH sums — the EMA renormalizes over
    * observed history, same rule both engines. */
  private def qRollingEma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
    val vq = floor($"value" * 10000.0 + 0.5).cast("long")
    val taps = (0 until 8).map { i =>
      (lag(vq, i).over(w), lit(1L << (7 - i)))
    }
    val num = taps.map { case (v, wt) =>
      coalesce(v, lit(0L)) * wt }.reduce(_ + _)
    val den = taps.map { case (v, wt) =>
      when(v.isNotNull, wt).otherwise(lit(0L)) }.reduce(_ + _)
    t(s, dir, "events")
      .select($"event_id", $"event_type", $"ts", $"value",
        (num.cast(DoubleType) / (den.cast(DoubleType) * lit(10000.0)))
          .as("ema8"))
      .orderBy($"event_id")
  }

  /** The star schema's FK edges, audited by [[qRiAudit]]. One row each:
    * (constraint name, child table, FK column, parent table, PK column). */
  private val FkEdges = Seq(
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
      "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
      "nation", "n_nationkey"))

  /** q_ri_audit — referential-integrity audit across every FK edge of
    * the star schema: per constraint, child rows, NULL FKs, distinct FK
    * values, and the orphan damage (keys + rows with no matching
    * parent). The data-quality gate a warehouse runs before trusting a
    * snapshot — the relational sibling of [[qDataProfile]]'s per-column
    * profile.
    *
    * Scale: the fact NEVER travels. Each edge first collapses the child
    * to a (fk → row-count) relation — a map-side-combinable aggregate,
    * so the shuffle carries distinct keys, not rows — and the orphan
    * check is a left-anti join of THAT relation against the parent's
    * key column (broadcast for dims; key-partitioned for the fact-fact
    * edge). Orphan ROWS then come free off the counts — no join back to
    * the fact. The 7 edges are independent branches of one union, so
    * they schedule as one job. All-integer outputs; zero float surface. */
  private def qRiAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val audits = FkEdges.map { case (name, child, fk, parent, pk) =>
      val keyed = t(s, dir, child)
        .groupBy(col(fk).as("fk")).agg(count(lit(1)).as("rows"))
      val totals = keyed.agg(
        sum($"rows").as("child_rows"),
        coalesce(sum(when($"fk".isNull, $"rows")), lit(0L)).as("null_fks"),
        count(when($"fk".isNotNull, lit(1))).as("distinct_fks"))
      val orphans = keyed.filter($"fk".isNotNull)
        .join(t(s, dir, parent).select(col(pk).as("pk")),
          $"fk" === $"pk", "left_anti")
        .agg(count(lit(1)).as("orphan_keys"),
          coalesce(sum($"rows"), lit(0L)).as("orphan_rows"))
      totals.crossJoin(orphans)
        .select(lit(name).as("constraint_name"), $"child_rows",
          $"null_fks", $"distinct_fks", $"orphan_keys", $"orphan_rows")
    }
    audits.reduce(_ unionByName _).orderBy($"constraint_name")
  }

  /** One q_ri_audit oracle branch; count(*) everywhere keeps every
    * metric BIGINT without HUGEINT casts. */
  private def riAuditBranch(name: String, child: String, fk: String,
                            parent: String, pk: String): String =
    s"""SELECT '$name' AS constraint_name,
          (SELECT count(*) FROM $child) AS child_rows,
          (SELECT count(*) FROM $child WHERE $fk IS NULL) AS null_fks,
          (SELECT count(DISTINCT $fk) FROM $child) AS distinct_fks,
          (SELECT count(DISTINCT $fk) FROM $child
            WHERE $fk IS NOT NULL
              AND $fk NOT IN (SELECT $pk FROM $parent)) AS orphan_keys,
          (SELECT count(*) FROM $child
            WHERE $fk IS NOT NULL
              AND $fk NOT IN (SELECT $pk FROM $parent)) AS orphan_rows"""

  /** q_anomaly_mad — robust per-group anomaly scores via the median
    * absolute deviation: |x − median| / MAD, the outlier detector that
    * (unlike [[qOutliers]]' z-score) a few extreme rows cannot drag —
    * the filter of choice for heavy-tailed quality signals in a
    * training-data pipeline.
    *
    * Both medians are EXACT order statistics selected from HISTOGRAMS,
    * never from a sorted fact (the [[qWinsorize]] selection): values
    * half-up-quantize to 1e-4 BIGINTs → per-(group, value) counts
    * (map-side combined, G×V rows). The deviation histogram then derives
    * from the VALUE histogram — regroup its rows by |xq − median| — so
    * the second median costs NO fact pass; two fact scans total (the
    * histogram build and the final scoring pass, bounds broadcast). Rank
    * arithmetic is integer ((n+1) div 2 = lower median); the score is
    * one double division, [[Det.round6]]'d. MAD = 0 (over half the group
    * at one value) yields NULL scores — flagged, not divided. */
  private def qAnomalyMad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xq = floor($"value" * 10000.0 + 0.5).cast("long")
    val e = t(s, dir, "events")
      .select($"event_id", $"event_type", $"value", xq.as("xq"))
    val h = e.groupBy($"event_type", $"xq").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val wcum = Window.partitionBy($"event_type").orderBy($"xq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy($"event_type")
      val med = h
        .withColumn("cum", sum($"cnt").over(wcum))
        .withColumn("n", sum($"cnt").over(wall))
        .groupBy($"event_type")
        .agg(min(when($"cum" >= expr("(n + 1) div 2"), $"xq")).as("med"))
      // deviation histogram: regroup the VALUE histogram, no fact pass
      val dh = h.join(broadcast(med), "event_type")
        .groupBy($"event_type", abs($"xq" - $"med").as("dev"))
        .agg(sum($"cnt").as("cnt"))
      val wdc = Window.partitionBy($"event_type").orderBy($"dev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mad = dh
        .withColumn("cum", sum($"cnt").over(wdc))
        .withColumn("n", sum($"cnt").over(wall))
        .groupBy($"event_type")
        .agg(min(when($"cum" >= expr("(n + 1) div 2"), $"dev")).as("mad"))
      val b = med.join(mad, "event_type")
      e.join(broadcast(b), "event_type")
        .select($"event_id", $"event_type", $"value",
          ($"med".cast(DoubleType) / 10000.0).as("median"),
          Det.round6(when($"mad" > 0,
            abs($"xq" - $"med").cast(DoubleType) / $"mad".cast(DoubleType)))
            .as("mad_score"),
          ($"mad" > 0 && abs($"xq" - $"med") > lit(3) * $"mad")
            .as("is_anomaly"))
        .orderBy($"event_id")
        .transform(graft.Exec.seal)
    } finally { h.unpersist(false) }
  }

  /** q_time_weighted_avg — per-type time-weighted mean of the event
    * value series: each observation holds until the next one, so it
    * weighs by its duration (the telemetry/IoT "average sensor reading"
    * that a plain AVG gets wrong under irregular sampling). The last
    * observation of a series carries no duration and drops from both
    * sums — the standard open-interval convention.
    *
    * One (type)-keyed Exchange: `lead` over (ts, event_id) supplies the
    * interval end (epoch-µs, `unix_micros` ≡ DuckDB `epoch_us` — the
    * repo's time convention), then duration·value products fold as
    * exact DECIMAL integers (1e-4-quantized value × µs duration,
    * DECIMAL(19,0)×DECIMAL(19,0) per-row products — a LONG product
    * could overflow for a sparse series spanning the full window) and
    * ONE double division finishes. The denominator Σdt is the series'
    * time span — integer, engine-identical. */
  private def qTimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"tus", $"event_id")
    val vq = floor($"value" * 10000.0 + 0.5).cast("long")
    val dec = DecimalType(19, 0)
    t(s, dir, "events")
      .select($"event_type", $"event_id", vq.as("vq"),
        unix_micros($"ts").as("tus"))
      .withColumn("dt", lead($"tus", 1).over(w) - $"tus")
      .filter($"dt".isNotNull)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_intervals"),
        sum($"dt").as("span_us"),
        sum($"vq".cast(dec) * $"dt".cast(dec)).as("wsum"))
      .select($"event_type", $"n_intervals", $"span_us",
        ($"wsum".cast(DoubleType) /
          ($"span_us".cast(DoubleType) * 10000.0)).as("twa"))
      .orderBy($"event_type")
  }

  /** q_linreg_trend — per-event-type OLS of value on time (slope,
    * intercept, R²): the drift detector a data pipeline runs over its
    * quality metrics ("is this signal trending?"), computed the only way
    * that scales — closed-form normal equations from power sums, never an
    * iterative fit.
    *
    * ONE scan, six map-side-combinable sums per group (n, Σx, Σy, Σxy,
    * Σx², Σy²); the G-row tail does the algebra. Determinism: x is
    * integer seconds since 2024-01-01 (epoch-µs div 10⁶ — small offsets
    * keep the power sums far from overflow), y is the 1e-4-quantized
    * BIGINT; all sums fold as DECIMAL(38,0) exact integers (Σx² at 10⁹
    * rows/group is ~4·10²⁵ — LONG dies at ~10⁶ rows, the [[qAggStats]]
    * widening), so the centered moments n·Σxy−ΣxΣy etc. are exact
    * integers too; slope/intercept/R² are then a fixed sequence of IEEE
    * double ops off those integers, mirrored token-for-token in the
    * oracle, and round6'd. */
  private def qLinregTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = DecimalType(38, 0)
    val x = (expr("unix_micros(ts) div 1000000") - lit(1704067200L)).cast(dec)
    val y = floor($"value" * 10000.0 + 0.5).cast("long").cast(dec)
    val agg = t(s, dir, "events")
      .select($"event_type", x.as("x"), y.as("y"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
    val covD = ($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType)
    val varxD = ($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType)
    val varyD = ($"n" * $"syy" - $"sy" * $"sy").cast(DoubleType)
    val nD = $"n".cast(DoubleType)
    val slope = covD / varxD / lit(10000.0)
    val meanX = $"sx".cast(DoubleType) / nD
    val meanY = $"sy".cast(DoubleType) / (nD * lit(10000.0))
    agg.select($"event_type", $"n".cast("long").as("n_obs"),
      Det.round6(slope).as("slope_per_sec"),
      Det.round6(meanY - slope * meanX).as("intercept"),
      Det.round6(covD * covD / (varxD * varyD)).as("r2"))
      .orderBy($"event_type")
  }

  /** q_changepoint_cusum — CUSUM changepoint per event type: the index
    * (and timestamp) where the cumulative deviation from the series mean
    * peaks — the classic single-changepoint statistic a pipeline-health
    * monitor runs over its metric streams.
    *
    * The mean is rational, so the statistic is scaled through by n:
    * D_i = n·cum_i − i·Σv is an EXACT integer (DECIMAL(38,0) — n·cum at
    * 10⁹ rows/group is ~10²⁸), and argmax|D| needs no floating compare.
    * One (type)-keyed sort feeds the cumulative window AND the
    * unordered full-partition n/Σv/max windows — a single Exchange; the
    * argmax row resolves by min_by on the unique row index (earliest
    * peak wins ties, both engines). The emitted statistic
    * max|cum_i − i·mean| = |D|/n is one double division, round6'd. */
  private def qChangepointCusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = DecimalType(38, 0)
    val wcum = Window.partitionBy($"event_type").orderBy($"tus", $"event_id")
    val wall = Window.partitionBy($"event_type")
    val vq = floor($"value" * 10000.0 + 0.5).cast("long")
    t(s, dir, "events")
      .select($"event_type", $"event_id",
        unix_micros($"ts").as("tus"), vq.as("vq"))
      .withColumn("i", row_number().over(wcum))
      .withColumn("cum", sum($"vq").over(wcum))
      .withColumn("n", count(lit(1)).over(wall))
      .withColumn("sv", sum($"vq").over(wall))
      .withColumn("absd", abs($"n".cast(dec) * $"cum".cast(dec)
        - $"i".cast(dec) * $"sv".cast(dec)))
      .withColumn("mx", max($"absd").over(wall))
      .filter($"absd" === $"mx")
      .groupBy($"event_type")
      .agg(min($"i").as("cp_idx"),
        expr("min_by(tus, i)").as("cp_tus"),
        min($"n").as("n_obs"),
        min($"absd").as("absd"))
      .select($"event_type", $"cp_idx", $"cp_tus", $"n_obs",
        Det.round6($"absd".cast(DoubleType)
          / ($"n_obs".cast(DoubleType) * lit(10000.0))).as("cusum_stat"))
      .orderBy($"event_type")
  }

  /** q_market_basket — pairwise frequent-itemset mining over the order
    * book (the support/lift readout of an a-priori pass, truncated at
    * pair size): which parts co-occur in baskets more than chance.
    *
    * Scale discipline: the shared [[Baskets.pairCore]] — a cheap probe
    * routes between the single-shuffle collect_set fast path (no hot
    * items, dedup inside the aggregate, all consumers sharing one
    * exchange) and the occurrence-level a-priori prune + hot-item cap
    * production path (pair volume bounded by Σ per-basket k², every
    * item's multiplicity ≤ [[Baskets.DefaultCap]] — a power-law hot
    * item would otherwise grow the pair stage quadratically in its
    * popularity). Pair generation is a per-basket list + double
    * explode, never a global cross; the item frequency table is
    * dimension-sized and broadcasts back for lift, counting the CAPPED
    * occurrences so lift stays coherent within the sample. Lift is
    * exact-integer arithmetic until one final double ratio, round6'd. */
  private def qMarketBasket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val core = Baskets.pairCore(
      t(s, dir, "lineitem").select($"l_orderkey", $"l_partkey"),
      "l_partkey", "l_orderkey")
    try {
      core.supHalf
        .join(broadcast(core.freq.select($"l_partkey".as("part_a"),
          $"c".as("c_a"))), "part_a")
        .join(broadcast(core.freq.select($"l_partkey".as("part_b"),
          $"c".as("c_b"))), "part_b")
        .crossJoin(broadcast(core.baskets))
        .select($"part_a", $"part_b", $"support",
          Det.round6(($"n_baskets".cast(DoubleType)
            * $"support".cast(DoubleType))
            / ($"c_a".cast(DoubleType) * $"c_b".cast(DoubleType)))
            .as("lift"))
        .orderBy($"support".desc, $"part_a", $"part_b")
        .transform(graft.Exec.seal)
    } finally {
      core.release()
    }
  }

  /** q_seasonality — hour-of-day seasonal profile per event type: each
    * (type, hour) cell's volume, mean value, and ratio to the type's
    * all-day mean — the diurnal-pattern readout (traffic shaping,
    * anomaly baselining, crawl scheduling) every telemetry stack keeps.
    *
    * ONE fact pass collapses to the (type, hour) histogram (map-side
    * combinable, G×24 rows); the per-type totals DERIVE from that
    * histogram — never a second fact scan (the q_tfidf lesson) — and
    * broadcast back as a G-row relation. Determinism: counts and
    * 1e-4-quantized value sums are exact integers; mean and ratio are a
    * fixed IEEE op sequence mirrored in the oracle, round6'd. */
  private def qSeasonality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vq = floor($"value" * 10000.0 + 0.5).cast("long")
    val h = t(s, dir, "events")
      .select($"event_type", hour($"ts").cast("long").as("hod"), vq.as("vq"))
      .groupBy($"event_type", $"hod")
      .agg(count(lit(1)).as("n"), sum($"vq").as("sv"))
    val tot = h.groupBy($"event_type")
      .agg(sum($"n").as("tn"), sum($"sv").as("tsv"))
    val mean = $"sv".cast(DoubleType) / ($"n".cast(DoubleType) * lit(10000.0))
    val tmean =
      $"tsv".cast(DoubleType) / ($"tn".cast(DoubleType) * lit(10000.0))
    h.join(broadcast(tot), "event_type")
      .select($"event_type", $"hod", $"n",
        Det.round6(mean).as("mean_value"),
        Det.round6(mean / tmean).as("seasonal_ratio"))
      .orderBy($"event_type", $"hod")
  }

  /** q_period_growth — month-over-month revenue growth per order
    * priority: the period-over-period delta every BI layer computes, as
    * one aggregation plus one lag. The month key is the integer index
    * (year·12 + month − 1, the [[qRetentionCohort]] convention — no
    * engine-specific date intervals), revenue folds via [[Det.sumd]]'s
    * exact DECIMAL quantization, and the growth ratio is one double
    * division off those exact sums, round6'd; the first month of each
    * series has no predecessor and reports NULL growth (both engines).
    *
    * Scale: ONE fact pass collapses to G×months rows (map-side
    * combinable); the lag window sorts that tiny relation per priority
    * — the fact never reaches the window. */
  private def qPeriodGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val midx =
      (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).cast("long")
    val w = Window.partitionBy($"o_orderpriority").orderBy($"midx")
    t(s, dir, "orders")
      .select($"o_orderpriority", midx.as("midx"), $"o_totalprice")
      .groupBy($"o_orderpriority", $"midx")
      .agg(count(lit(1)).as("n_orders"),
        Det.sumd($"o_totalprice").as("revenue"))
      .withColumn("prev_revenue", lag($"revenue", 1).over(w))
      .withColumn("mom_growth", Det.round6(
        ($"revenue" - $"prev_revenue") / $"prev_revenue"))
      .orderBy($"o_orderpriority", $"midx")
  }

  /** q_gini — revenue-concentration (Gini coefficient) of customer spend
    * within each nation: G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the
    * ascending-sorted per-customer revenues — the standard inequality
    * summary a marketplace-analytics layer reports per region ("do 20%
    * of customers carry 80% of revenue here?").
    *
    * Exactness: per-customer revenue folds via the DECIMAL(18,4)
    * quantization, then scales to BIGINT ten-thousandths, so the rank
    * products i·xᵢ and both Σ fold as EXACT integers (order-independent
    * under any partial-agg merge; bounded ≪ 2⁶³ at bench scale — the
    * 100 TB variant widens to DECIMAL(38,4), same plan). Equal revenues
    * commute in Σ i·xᵢ, so the custkey tie-break affects nothing. Only
    * the final G is double — one identical left-associated IEEE
    * expression per engine, round6'd.
    *
    * Scale: ONE fact pass to per-customer sums (map-combinable); the
    * rank window partitions by nation; the final fold is 25 rows. */
  private def qGini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custRev = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(18,4)")) * 10000)
        .cast("long").as("rev_q"))
    val dim = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    val w = Window.partitionBy($"n_name").orderBy($"rev_q", $"o_custkey")
    custRev
      .join(broadcast(dim), $"o_custkey" === $"c_custkey")
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_cust"),
        sum($"rev_q").as("s_x"),
        sum($"i" * $"rev_q").as("s_ix"))
      .select($"n_name", $"n_cust",
        Det.round6($"s_x".cast("double") / lit(10000.0)).as("total_rev"),
        Det.round6(
          (lit(2.0) * $"s_ix".cast("double")) /
            ($"n_cust".cast("double") * $"s_x".cast("double")) -
            ($"n_cust" + 1).cast("double") / $"n_cust".cast("double"))
          .as("gini"))
      .orderBy($"n_name")
  }

  /** q_ks_drift — two-sample Kolmogorov–Smirnov drift test of each
    * event_type's value distribution against the 'view' reference:
    * D = max_x |CDF_t(x) − CDF_ref(x)|, the classic nonparametric
    * "did this feature's distribution move?" monitor run next to
    * [[MlOps]]'s embedding-level drift check.
    *
    * Determinism: values land on the 1e-2 grid (the data's own
    * precision), so the empirical CDFs are step functions over exact
    * integer cells; D's argmax compares the INTEGER cross product
    * |cum_t·N_ref − cum_ref·N_t| (exact to N_t·N_ref ≲ 9·10¹⁸ — lift
    * to DECIMAL(38,0) beyond ~3·10⁹ rows per side), and only the
    * final D divides, round6'd.
    *
    * Plan: one fact scan combines into (type, cell) counts; each
    * type's jump-point set merges with the broadcast reference cells
    * via a UNION + re-aggregate (never a fact join); the cumulative
    * window partitions by type over CELL relations — bounded by the
    * value grid, not the corpus — and the final max is a G-row
    * aggregate. */
  private def qKsDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val RefType = "view"
    val ev = t(s, dir, "events")
      .select($"event_type",
        floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("qv"))
    val cells = ev.groupBy($"event_type", $"qv")
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tot = cells.groupBy($"event_type").agg(sum($"n").as("nt"))
      val refCells = cells.filter($"event_type" === RefType)
        .select($"qv", $"n".as("nref"))
      val refTot = tot.filter($"event_type" === RefType)
        .select($"nt".as("nr"))
      val typeList = tot.filter($"event_type" =!= RefType)
        .select($"event_type", $"nt")
      val merged = cells.filter($"event_type" =!= RefType)
        .select($"event_type", $"qv", $"n".as("ct0"), lit(0L).as("cr0"))
        .unionByName(typeList.select($"event_type")
          .crossJoin(refCells)
          .select($"event_type", $"qv", lit(0L).as("ct0"),
            $"nref".as("cr0")))
        .groupBy($"event_type", $"qv")
        .agg(sum($"ct0").as("dt"), sum($"cr0").as("dr"))
      val w = Window.partitionBy($"event_type").orderBy($"qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      merged
        .withColumn("ct", sum($"dt").over(w))
        .withColumn("cr", sum($"dr").over(w))
        .join(broadcast(typeList), Seq("event_type"))
        .crossJoin(broadcast(refTot))
        .groupBy($"event_type")
        // the ct·nr / cr·nt cross products run in DECIMAL(38,0): past
        // 2⁶³ (n·n_ref > 9.2e18, reachable at 100 TB event counts)
        // Spark non-ANSI would wrap silently where DuckDB raises —
        // the lift makes both engines exact instead
        .agg(max($"nt").as("n"), max($"nr").as("n_ref"),
          max(abs($"ct".cast(DecimalType(38, 0)) * $"nr"
            - $"cr".cast(DecimalType(38, 0)) * $"nt")).as("dmax"))
        .select($"event_type", $"n", $"n_ref",
          Det.round6($"dmax".cast(DoubleType)
            / ($"n".cast(DoubleType) * $"n_ref".cast(DoubleType)))
            .as("ks_stat"))
        .orderBy($"event_type")
    } finally cells.unpersist(false)
  }

  val queries: Map[String, Q] = Map(
    "q_ks_drift" -> (qKsDrift _),
    "q_gini" -> (qGini _),
    "q_period_growth" -> (qPeriodGrowth _),
    "q_seasonality" -> (qSeasonality _),
    "q_linreg_trend" -> (qLinregTrend _),
    "q_changepoint_cusum" -> (qChangepointCusum _),
    "q_market_basket" -> (qMarketBasket _),
    "q_ri_audit" -> (qRiAudit _),
    "q_anomaly_mad" -> (qAnomalyMad _),
    "q_time_weighted_avg" -> (qTimeWeightedAvg _),
    "q_rolling_ema" -> (qRollingEma _),
    "q_ab_test" -> (qAbTest _),
    "q_ohlc_resample" -> (qOhlcResample _),
    "q_rfm" -> (qRfm _),
    "q_rolling_distinct" -> (qRollingDistinct _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_attribution" -> (qAttribution _),
    "q_data_profile" -> (qDataProfile _),
    "q_skyline" -> (qSkyline _),
    "q_winsorize" -> (qWinsorize _),
    "q_sessionize" -> (qSessionize _),
    "q_retention_cohort" -> (qRetentionCohort _),
    "q_window_range" -> (qWindowRange _),
    "q_scd2" -> (qScd2 _),
    "q_outliers" -> (qOutliers _),
    "q_range_join_binned" -> (qRangeJoinBinned _))

  /** Oracle for q_data_profile, generated from the same [[ProfileCols]]
    * renderings the Spark query uses (one UNION ALL branch per column). */
  private val DataProfileSql: String = {
    val branches = ProfileCols.map { case (name, _, fmt) =>
      s"""SELECT '$name' AS column_name,
             count(*) AS n_rows,
             CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             count(DISTINCT $name) AS n_distinct,
             ${fmt(s"min($name)")} AS min_value,
             ${fmt(s"max($name)")} AS max_value,
             CAST(sum(length(${fmt(name)})) AS DOUBLE) / count($name)
               AS avg_len
           FROM lineitem"""
    }
    branches.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY column_name")
  }

  val oracles: Map[String, String] = Map(
    "q_ks_drift" ->
      s"""WITH ev AS (
           SELECT event_type,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) qv
           FROM events),
         cells AS (SELECT event_type, qv, count(*) n FROM ev
                   GROUP BY event_type, qv),
         tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) nt FROM cells
                 GROUP BY event_type),
         refc AS (SELECT qv, n nref FROM cells
                  WHERE event_type = 'view'),
         reft AS (SELECT nt nr FROM tot WHERE event_type = 'view'),
         tl AS (SELECT event_type, nt FROM tot
                WHERE event_type <> 'view'),
         m AS (
           SELECT event_type, qv, CAST(sum(ct0) AS BIGINT) dt,
                  CAST(sum(cr0) AS BIGINT) dr
           FROM (
             SELECT event_type, qv, n ct0, 0 cr0 FROM cells
             WHERE event_type <> 'view'
             UNION ALL
             SELECT tl.event_type, refc.qv, 0, refc.nref FROM tl, refc)
           GROUP BY event_type, qv),
         c AS (
           SELECT event_type, qv,
                  CAST(sum(dt) OVER (PARTITION BY event_type
                         ORDER BY qv) AS BIGINT) ct,
                  CAST(sum(dr) OVER (PARTITION BY event_type
                         ORDER BY qv) AS BIGINT) cr
           FROM m)
         SELECT c.event_type, max(tl.nt) AS n, max(reft.nr) AS n_ref,
                ${Det.ROUND6("CAST(max(abs(ct * reft.nr - cr * tl.nt)) AS DOUBLE) / (CAST(max(tl.nt) AS DOUBLE) * max(reft.nr))")}
                  AS ks_stat
         FROM c JOIN tl ON c.event_type = tl.event_type, reft
         GROUP BY c.event_type ORDER BY c.event_type""",
    "q_gini" ->
      """WITH cr AS (
           SELECT o_custkey,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
                       AS BIGINT) rev_q
           FROM orders GROUP BY o_custkey),
         d AS (
           SELECT c_custkey, n_name
           FROM customer JOIN nation ON c_nationkey = n_nationkey),
         r AS (
           SELECT n_name, rev_q,
                  CAST(row_number() OVER (PARTITION BY n_name
                    ORDER BY rev_q, o_custkey) AS BIGINT) i
           FROM cr JOIN d ON o_custkey = c_custkey),
         g AS (
           SELECT n_name, count(*) n_cust,
                  CAST(sum(rev_q) AS BIGINT) s_x,
                  CAST(sum(i * rev_q) AS BIGINT) s_ix
           FROM r GROUP BY n_name)
         SELECT n_name, n_cust,
                floor((CAST(s_x AS DOUBLE) / 10000.0)
                      * 1000000.0 + 0.5) / 1000000.0 AS total_rev,
                floor(((2.0 * CAST(s_ix AS DOUBLE))
                       / (CAST(n_cust AS DOUBLE) * CAST(s_x AS DOUBLE))
                       - CAST(n_cust + 1 AS DOUBLE) / CAST(n_cust AS DOUBLE))
                      * 1000000.0 + 0.5) / 1000000.0 AS gini
         FROM g ORDER BY n_name""",
    "q_period_growth" ->
      s"""WITH m AS (
           SELECT o_orderpriority,
                  CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                       AS BIGINT) midx,
                  count(*) n_orders,
                  ${Det.SUMD("o_totalprice")} AS revenue
           FROM orders GROUP BY o_orderpriority, 2),
         g AS (
           SELECT *, lag(revenue, 1) OVER (PARTITION BY o_orderpriority
                       ORDER BY midx) prev_revenue
           FROM m)
         SELECT o_orderpriority, midx, n_orders, revenue, prev_revenue,
                ${Det.ROUND6("(revenue - prev_revenue) / prev_revenue")}
                  AS mom_growth
         FROM g ORDER BY o_orderpriority, midx""",
    "q_seasonality" ->
      s"""WITH h AS (
           SELECT event_type, CAST(hour(ts) AS BIGINT) hod, count(*) n,
                  CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT))
                       AS BIGINT) sv
           FROM events GROUP BY event_type, hour(ts)),
         tot AS (
           SELECT event_type, CAST(sum(n) AS BIGINT) tn,
                  CAST(sum(sv) AS BIGINT) tsv
           FROM h GROUP BY event_type)
         SELECT h.event_type, h.hod, h.n,
                ${Det.ROUND6(
        "CAST(h.sv AS DOUBLE) / (CAST(h.n AS DOUBLE) * 10000.0)")}
                  AS mean_value,
                ${Det.ROUND6(
        "(CAST(h.sv AS DOUBLE) / (CAST(h.n AS DOUBLE) * 10000.0))" +
          " / (CAST(tot.tsv AS DOUBLE) / (CAST(tot.tn AS DOUBLE) * 10000.0))")}
                  AS seasonal_ratio
         FROM h JOIN tot ON h.event_type = tot.event_type
         ORDER BY h.event_type, h.hod""",
    "q_linreg_trend" ->
      s"""WITH q AS (
           SELECT event_type,
                  CAST(epoch_us(ts) // 1000000 - 1704067200 AS HUGEINT) x,
                  CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                       AS HUGEINT) y
           FROM events),
         a AS (
           SELECT event_type, CAST(count(*) AS HUGEINT) n,
                  sum(x) sx, sum(y) sy, sum(x * y) sxy,
                  sum(x * x) sxx, sum(y * y) syy
           FROM q GROUP BY event_type),
         m AS (
           SELECT event_type, n, sx, sy,
                  CAST(n * sxy - sx * sy AS DOUBLE) cov,
                  CAST(n * sxx - sx * sx AS DOUBLE) varx,
                  CAST(n * syy - sy * sy AS DOUBLE) vary
           FROM a)
         SELECT event_type, CAST(n AS BIGINT) AS n_obs,
                ${Det.ROUND6("cov / varx / 10000.0")} AS slope_per_sec,
                ${Det.ROUND6(
        "CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)" +
          " - cov / varx / 10000.0 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))")}
                  AS intercept,
                ${Det.ROUND6("cov * cov / (varx * vary)")} AS r2
         FROM m ORDER BY event_type""",
    "q_changepoint_cusum" ->
      s"""WITH q AS (
           SELECT event_type, event_id, epoch_us(ts) tus,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) vq
           FROM events),
         w AS (
           SELECT event_type, event_id, tus,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY tus, event_id) i,
                  sum(vq) OVER (PARTITION BY event_type
                    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) cum,
                  count(*) OVER (PARTITION BY event_type) n,
                  sum(vq) OVER (PARTITION BY event_type) sv
           FROM q),
         d AS (
           SELECT *, abs(CAST(n AS HUGEINT) * CAST(cum AS HUGEINT)
                       - CAST(i AS HUGEINT) * CAST(sv AS HUGEINT)) absd
           FROM w),
         x AS (
           SELECT *, max(absd) OVER (PARTITION BY event_type) mx FROM d)
         SELECT event_type, min(i) AS cp_idx, arg_min(tus, i) AS cp_tus,
                min(n) AS n_obs,
                ${Det.ROUND6("CAST(min(absd) AS DOUBLE)" +
        " / (CAST(min(n) AS DOUBLE) * 10000.0)")} AS cusum_stat
         FROM x WHERE absd = mx GROUP BY event_type
         ORDER BY event_type""",
    "q_market_basket" ->
      s"""WITH items AS (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         freq0 AS (
           SELECT l_partkey, count(*) c FROM items
           GROUP BY l_partkey HAVING count(*) >= 2),
         pruned AS (
           SELECT i.l_orderkey, i.l_partkey FROM items i
           JOIN freq0 f ON i.l_partkey = f.l_partkey),
         capped AS (
           ${Baskets.capSql("pruned", "l_partkey", "l_orderkey")}),
         freq AS (
           SELECT l_partkey, count(*) c FROM capped GROUP BY l_partkey),
         sup AS (
           SELECT a.l_partkey part_a, b.l_partkey part_b, count(*) support
           FROM capped a JOIN capped b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2),
         nb AS (SELECT count(DISTINCT l_orderkey) n_baskets FROM items)
         SELECT part_a, part_b, support,
                ${Det.ROUND6(
        "(CAST(n_baskets AS DOUBLE) * CAST(support AS DOUBLE))" +
          " / (CAST(fa.c AS DOUBLE) * CAST(fb.c AS DOUBLE))")} AS lift
         FROM sup
         JOIN freq fa ON part_a = fa.l_partkey
         JOIN freq fb ON part_b = fb.l_partkey
         CROSS JOIN nb
         ORDER BY support DESC, part_a, part_b""",
    "q_ri_audit" ->
      FkEdges.map { case (name, child, fk, parent, pk) =>
        riAuditBranch(name, child, fk, parent, pk)
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY constraint_name"),
    "q_anomaly_mad" ->
      s"""WITH e AS (
           SELECT event_id, event_type, value,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) xq
           FROM events),
         h AS (SELECT event_type, xq, count(*) cnt
               FROM e GROUP BY event_type, xq),
         hc AS (
           SELECT event_type, xq,
                  sum(cnt) OVER (PARTITION BY event_type ORDER BY xq
                    ROWS UNBOUNDED PRECEDING) cum,
                  sum(cnt) OVER (PARTITION BY event_type) n
           FROM h),
         med AS (
           SELECT event_type,
                  min(CASE WHEN cum >= (n + 1) // 2 THEN xq END) med
           FROM hc GROUP BY event_type),
         dh AS (
           SELECT h.event_type, abs(h.xq - med.med) dev, sum(h.cnt) cnt
           FROM h JOIN med ON h.event_type = med.event_type
           GROUP BY h.event_type, abs(h.xq - med.med)),
         dc AS (
           SELECT event_type, dev,
                  sum(cnt) OVER (PARTITION BY event_type ORDER BY dev
                    ROWS UNBOUNDED PRECEDING) cum,
                  sum(cnt) OVER (PARTITION BY event_type) n
           FROM dh),
         mad AS (
           SELECT event_type,
                  min(CASE WHEN cum >= (n + 1) // 2 THEN dev END) mad
           FROM dc GROUP BY event_type),
         b AS (SELECT med.event_type, med.med, mad.mad
               FROM med JOIN mad ON med.event_type = mad.event_type)
         SELECT e.event_id, e.event_type, e.value,
                CAST(b.med AS DOUBLE) / 10000.0 AS median,
                ${Det.ROUND6("CASE WHEN b.mad > 0 THEN " +
          "CAST(abs(e.xq - b.med) AS DOUBLE) / CAST(b.mad AS DOUBLE) END")}
                  AS mad_score,
                (b.mad > 0 AND abs(e.xq - b.med) > 3 * b.mad) AS is_anomaly
         FROM e JOIN b ON e.event_type = b.event_type
         ORDER BY e.event_id""",
    "q_time_weighted_avg" ->
      """WITH q AS (
           SELECT event_type,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) vq,
                  epoch_us(ts) tus, event_id
           FROM events),
         iv AS (
           SELECT event_type, vq,
                  lead(tus, 1) OVER (PARTITION BY event_type
                    ORDER BY tus, event_id) - tus dt
           FROM q),
         a AS (
           SELECT event_type, count(*) n_intervals,
                  CAST(sum(dt) AS BIGINT) span_us,
                  sum(CAST(vq AS DECIMAL(19,0))
                      * CAST(dt AS DECIMAL(19,0))) wsum
           FROM iv WHERE dt IS NOT NULL GROUP BY event_type)
         SELECT event_type, n_intervals, span_us,
                CAST(wsum AS DOUBLE) / (CAST(span_us AS DOUBLE) * 10000.0)
                  AS twa
         FROM a ORDER BY event_type""",
    "q_rolling_ema" -> {
      val num = (0 until 8).map(i =>
        s"coalesce(lag(vq, $i) OVER win, 0) * ${1L << (7 - i)}")
        .mkString(" + ")
      val den = (0 until 8).map(i =>
        s"CASE WHEN lag(vq, $i) OVER win IS NOT NULL THEN ${1L << (7 - i)} ELSE 0 END")
        .mkString(" + ")
      s"""WITH q AS (
           SELECT event_id, event_type, ts, value,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) vq
           FROM events),
         e AS (
           SELECT event_id, event_type, ts, value,
                  CAST($num AS BIGINT) num, CAST($den AS BIGINT) den
           FROM q
           WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id))
         SELECT event_id, event_type, ts, value,
                CAST(num AS DOUBLE) / (CAST(den AS DOUBLE) * 10000.0) AS ema8
         FROM e ORDER BY event_id"""
    },
    "q_ab_test" ->
      s"""WITH q AS (
           SELECT event_type, user_id % 2 = 0 isa,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) v
           FROM events),
         s AS (
           SELECT event_type,
             CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) n_a,
             CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) n_b,
             CAST(sum(CASE WHEN isa THEN v ELSE 0 END) AS BIGINT) sx_a,
             CAST(sum(CASE WHEN NOT isa THEN v ELSE 0 END) AS BIGINT) sx_b,
             CAST(sum(CASE WHEN isa THEN v * v ELSE 0 END) AS BIGINT) sx2_a,
             CAST(sum(CASE WHEN NOT isa THEN v * v ELSE 0 END) AS BIGINT) sx2_b
           FROM q GROUP BY event_type),
         m AS (
           SELECT event_type, n_a, n_b,
             CAST(sx_a AS DOUBLE) / (n_a * 10000.0) mean_a,
             CAST(sx_b AS DOUBLE) / (n_b * 10000.0) mean_b,
             CAST(CAST(n_a AS HUGEINT) * sx2_a
                  - CAST(sx_a AS HUGEINT) * sx_a AS DOUBLE)
               / (CAST(CAST(n_a AS HUGEINT) * (n_a - 1) AS DOUBLE)
                  * 100000000.0) va,
             CAST(CAST(n_b AS HUGEINT) * sx2_b
                  - CAST(sx_b AS HUGEINT) * sx_b AS DOUBLE)
               / (CAST(CAST(n_b AS HUGEINT) * (n_b - 1) AS DOUBLE)
                  * 100000000.0) vb
           FROM s WHERE n_a >= 2 AND n_b >= 2)
         SELECT event_type, n_a, n_b, mean_a, mean_b,
                ${Det.ROUND6("(mean_a - mean_b) / sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))")}
                  AS t_welch
         FROM m ORDER BY event_type""",
    "q_ohlc_resample" ->
      s"""WITH e AS (
           SELECT event_type, epoch_us(ts) us, event_id, value,
                  (epoch_us(ts) // 900000000) * 900 AS bar
           FROM events),
         r AS (
           SELECT *,
                  row_number() OVER (PARTITION BY event_type, bar
                                     ORDER BY us, event_id) rn_a,
                  row_number() OVER (PARTITION BY event_type, bar
                                     ORDER BY us DESC, event_id DESC) rn_z
           FROM e)
         SELECT event_type, bar,
                min(CASE WHEN rn_a = 1 THEN value END) AS px_open,
                min(CASE WHEN rn_z = 1 THEN value END) AS px_close,
                min(value) AS px_low, max(value) AS px_high,
                count(*) AS n_events,
                ${Det.SUMD("value")} AS val_sum
         FROM r GROUP BY event_type, bar
         ORDER BY event_type, bar""",
    "q_rfm" ->
      """WITH c AS (
           SELECT o_custkey,
                  max(CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT)) lastd,
                  count(*) fq,
                  CAST(sum(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT))
                       AS BIGINT) mq
           FROM orders GROUP BY o_custkey),
         base AS (
           SELECT o_custkey, (SELECT max(lastd) FROM c) - lastd AS rq, fq, mq
           FROM c),
         rb AS (
           SELECT min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END) b1,
                  min(CASE WHEN cum >= (n * 2 + 3) // 4 THEN v END) b2,
                  min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END) b3
           FROM (SELECT v, sum(cnt) OVER (ORDER BY v) cum, sum(cnt) OVER () n
                 FROM (SELECT rq v, count(*) cnt FROM base GROUP BY rq))),
         fb AS (
           SELECT min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END) b1,
                  min(CASE WHEN cum >= (n * 2 + 3) // 4 THEN v END) b2,
                  min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END) b3
           FROM (SELECT v, sum(cnt) OVER (ORDER BY v) cum, sum(cnt) OVER () n
                 FROM (SELECT fq v, count(*) cnt FROM base GROUP BY fq))),
         mb AS (
           SELECT min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END) b1,
                  min(CASE WHEN cum >= (n * 2 + 3) // 4 THEN v END) b2,
                  min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END) b3
           FROM (SELECT v, sum(cnt) OVER (ORDER BY v) cum, sum(cnt) OVER () n
                 FROM (SELECT mq v, count(*) cnt FROM base GROUP BY mq))),
         s AS (
           SELECT base.o_custkey, rq, fq, mq,
                  CAST(5 - (1 + (CASE WHEN rq > rb.b1 THEN 1 ELSE 0 END)
                              + (CASE WHEN rq > rb.b2 THEN 1 ELSE 0 END)
                              + (CASE WHEN rq > rb.b3 THEN 1 ELSE 0 END))
                       AS BIGINT) r_score,
                  CAST(1 + (CASE WHEN fq > fb.b1 THEN 1 ELSE 0 END)
                         + (CASE WHEN fq > fb.b2 THEN 1 ELSE 0 END)
                         + (CASE WHEN fq > fb.b3 THEN 1 ELSE 0 END)
                       AS BIGINT) f_score,
                  CAST(1 + (CASE WHEN mq > mb.b1 THEN 1 ELSE 0 END)
                         + (CASE WHEN mq > mb.b2 THEN 1 ELSE 0 END)
                         + (CASE WHEN mq > mb.b3 THEN 1 ELSE 0 END)
                       AS BIGINT) m_score
           FROM base, rb, fb, mb)
         SELECT o_custkey, rq AS recency_days, fq AS frequency,
                CAST(mq AS DOUBLE) / 10000.0 AS monetary,
                r_score, f_score, m_score,
                CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                  || CAST(m_score AS VARCHAR) AS segment
         FROM s ORDER BY o_custkey""",
    "q_rolling_distinct" ->
      """WITH acts AS (
           SELECT DISTINCT user_id,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS BIGINT) AS day
           FROM events),
         days AS (SELECT DISTINCT day FROM acts)
         SELECT d.day AS day, count(DISTINCT a.user_id) AS n_active_7d
         FROM days d JOIN acts a ON a.day BETWEEN d.day - 6 AND d.day
         GROUP BY d.day ORDER BY day""",
    "q_event_transitions" ->
      """WITH p AS (
           SELECT event_type src,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) dst
           FROM events),
         c AS (SELECT src, dst, count(*) n_trans FROM p
               WHERE dst IS NOT NULL GROUP BY src, dst)
         SELECT src, dst, n_trans,
                floor(CAST(n_trans AS DOUBLE)
                      / sum(n_trans) OVER (PARTITION BY src)
                      * 1000000.0 + 0.5) / 1000000.0 AS p
         FROM c ORDER BY src, dst""",
    "q_attribution" ->
      """WITH w AS (
           SELECT event_id, user_id, event_type, value,
                  last_value(CASE WHEN event_type <> 'purchase'
                                  THEN event_type END IGNORE NULLS)
                    OVER win AS touch_type,
                  last_value(CASE WHEN event_type <> 'purchase'
                                  THEN event_id END IGNORE NULLS)
                    OVER win AS touch_id
           FROM events
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING))
         SELECT event_id AS purchase_id, user_id, value,
                coalesce(touch_type, '(none)') AS channel, touch_id
         FROM w WHERE event_type = 'purchase'
         ORDER BY purchase_id""",
    "q_data_profile" -> DataProfileSql,
    "q_sessionize" ->
      """WITH e AS (
           SELECT user_id, ts, event_id, epoch_us(ts) us FROM events),
         f AS (
           SELECT *, CASE WHEN lag(us) OVER w IS NULL
                            OR us - lag(us) OVER w > 21600000000
                          THEN 1 ELSE 0 END new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         g AS (
           SELECT *, sum(new_s) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid
           FROM f)
         SELECT user_id, CAST(sid AS BIGINT) AS session_id,
                min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, session_id""",
    "q_retention_cohort" ->
      """WITH e AS (
           SELECT o_custkey,
                  CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                       AS BIGINT) midx
           FROM orders),
         f AS (SELECT o_custkey, min(midx) cidx FROM e GROUP BY o_custkey),
         sz AS (SELECT cidx, count(*) cohort_size FROM f GROUP BY cidx),
         act AS (
           SELECT f.cidx, e.midx - f.cidx months_since,
                  count(DISTINCT e.o_custkey) n_active
           FROM e JOIN f USING (o_custkey) GROUP BY 1, 2)
         SELECT make_date(CAST(act.cidx // 12 AS INT),
                          CAST(act.cidx % 12 + 1 AS INT), 1) cohort_month,
                months_since, n_active, cohort_size,
                floor(CAST(n_active AS DOUBLE) / cohort_size
                      * 1000000.0 + 0.5) / 1000000.0 retention
         FROM act JOIN sz USING (cidx)
         ORDER BY cohort_month, months_since""",
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey, day,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w
                     AS DECIMAL(18,4)) AS DOUBLE) AS rev_30d,
                count(*) OVER w AS n_orders_30d
         FROM (SELECT *, CAST(date_diff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS BIGINT) AS day FROM orders)
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey, o_custkey, day, rev_30d, n_orders_30d""",
    "q_scd2" ->
      """WITH m AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) prev
           FROM events),
         c AS (SELECT * FROM m
               WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id,
                CAST(row_number() OVER w AS BIGINT) AS version,
                event_type, ts AS valid_from,
                lead(ts) OVER w AS valid_to
         FROM c
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, version""",
    "q_skyline" ->
      """WITH p AS (
           SELECT p_partkey, p_retailprice, p_size FROM part),
         lvl AS (
           SELECT p_retailprice, min(p_size) msz FROM p GROUP BY 1),
         l2 AS (
           SELECT *, min(msz) OVER (ORDER BY p_retailprice DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) prevmin
           FROM lvl)
         SELECT p.p_partkey, p.p_retailprice, p.p_size
         FROM p JOIN l2 USING (p_retailprice)
         WHERE NOT (prevmin IS NOT NULL AND prevmin <= p_size)
           AND NOT (msz < p_size)
         ORDER BY p_partkey""",
    "q_winsorize" ->
      """WITH e AS (
           SELECT event_id, event_type, value,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) xq
           FROM events),
         h AS (SELECT event_type, xq, count(*) cnt FROM e GROUP BY 1, 2),
         hc AS (
           SELECT *,
                  sum(cnt) OVER (PARTITION BY event_type ORDER BY xq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
                  sum(cnt) OVER (PARTITION BY event_type) n
           FROM h),
         b AS (
           SELECT event_type,
                  min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN xq END) lo,
                  min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN xq END) hi
           FROM hc GROUP BY event_type)
         SELECT e.event_id, e.event_type, e.value,
                CAST(least(greatest(e.xq, b.lo), b.hi) AS DOUBLE) / 10000.0
                  AS value_w,
                (e.xq < b.lo OR e.xq > b.hi) AS clipped
         FROM e JOIN b USING (event_type) ORDER BY event_id""",
    "q_range_join_binned" ->
      s"""WITH w AS (
           SELECT event_id wid,
                  epoch_us(ts) - 300000000 lo_us,
                  epoch_us(ts) + 300000000 hi_us
           FROM events WHERE event_type = 'error'),
         p AS (SELECT event_id, value, epoch_us(ts) e_us FROM events)
         SELECT w.wid, count(*) AS n_events,
                ${Det.SUMD("p.value")} AS val_sum
         FROM p JOIN w ON p.e_us >= w.lo_us AND p.e_us < w.hi_us
         GROUP BY w.wid ORDER BY wid""",
    "q_outliers" ->
      """WITH q AS (
           SELECT event_id, event_type, value,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) xq
           FROM events),
         st AS (
           SELECT event_type, CAST(count(*) AS HUGEINT) n,
                  CAST(sum(CAST(xq AS HUGEINT)) AS HUGEINT) sx,
                  CAST(sum(CAST(xq AS HUGEINT) * xq) AS HUGEINT) sx2
           FROM q GROUP BY event_type),
         z AS (
           SELECT q.event_id, q.event_type, q.value,
                  (CAST(q.xq AS DOUBLE)
                     - CAST(st.sx AS DOUBLE) / CAST(st.n AS DOUBLE))
                  / sqrt(CAST(st.n * st.sx2 - st.sx * st.sx AS DOUBLE)
                         / CAST(st.n * st.n AS DOUBLE)) z
           FROM q JOIN st USING (event_type))
         SELECT event_id, event_type, value,
                floor(z * 1000000.0 + 0.5) / 1000000.0 zscore
         FROM z WHERE abs(z) > 2.0
         ORDER BY event_id""")
}

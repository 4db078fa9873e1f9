package graft.streaming

import graft.{Det, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming surface (SURVEY.md §2.10; the reference has none — `E`).
  *
  * Each windowed aggregation exists twice, over the SAME transform
  * semantics:
  *  - a batch-equivalent declared query (tumbling/sliding/session) that the
  *    DuckDB t2 oracle can check, and
  *  - the streaming form (`transforms` below): `readStream`-ready
  *    DataFrame→DataFrame functions with watermarks, exercised by ScalaTest
  *    over `MemoryStream` (ST1–ST5; watermark/late-data semantics are not
  *    batch-expressible, SURVEY.md §2.10 ST4/ST5).
  *
  * Scale: windowed aggs shuffle on (window, key) with partial aggregation;
  * session windows keep per-user state bounded by the watermark horizon —
  * the state store grows with active users, not event history.
  */
object StreamOps extends QueryModule {

  // ------------------------------------------------ streaming transforms

  /** ST1 — tumbling 1h counts with 10-minute watermark (append-ready). */
  def tumblingCounts(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
  }

  /** ST2 — sliding 1h/15min counts. */
  def slidingCounts(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
  }

  /** ST3 — 30-minute-gap session windows per user. */
  def sessionCounts(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"user_id", $"n_events")
  }

  /** ST8 — streaming OHLC: 15-minute bars per event type, the streaming
    * twin of the batch `q_ohlc_resample`. Open/close use the identical
    * deterministic first/last — min/max over the (epoch-µs, event_id,
    * value) struct — but maintained INCREMENTALLY: struct min/max merge
    * associatively, so per-open-bar state is two structs + two doubles +
    * a count regardless of how many micro-batches feed the bar, and no
    * per-bar sort ever exists. Append mode emits each bar exactly once,
    * when the watermark passes its end. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "15 minutes"), $"event_type")
      .agg(
        min(struct(unix_micros($"ts").as("us"), $"event_id", $"value"))
          .getField("value").as("px_open"),
        max(struct(unix_micros($"ts").as("us"), $"event_id", $"value"))
          .getField("value").as("px_close"),
        min($"value").as("px_low"), max($"value").as("px_high"),
        count(lit(1)).as("n_events"))
      .select($"window.start".as("bar_start"), $"event_type",
        $"px_open", $"px_close", $"px_low", $"px_high", $"n_events")
  }

  /** ST5 — stateful dedup by event_id inside the watermark horizon. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom per-key state (SURVEY.md §1.4 / §2.10): running per-user
    * counters via `flatMapGroupsWithState` — emits one update row per
    * user per micro-batch carrying (n_events, value_sum so far). State is
    * one small struct per active user; at 100 TB horizon the state store
    * scales with users, not events. */
  case class UserStat(n: Long, sum: Double)
  case class UserUpdate(user_id: Long, n_events: Long, value_sum: Double)

  def runningUserStats(events: org.apache.spark.sql.Dataset[
      (Long, Double)]): org.apache.spark.sql.Dataset[UserUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[UserStat, UserUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(0L, 0.0))
          val batch = rows.toSeq
          val next = UserStat(prev.n + batch.size, prev.sum + batch.map(_._2).sum)
          state.update(next)
          Iterator.single(UserUpdate(user, next.n, next.sum))
      }
  }

  /** Spark-4-native rewrite of [[runningUserStats]] on the
    * `transformWithState` API (the arbitrary-state successor to
    * `flatMapGroupsWithState`): explicit named `ValueState` handles with
    * per-state TTL, timers, and schema evolution — the operator shape new
    * stateful pipelines should target. Semantics are identical to
    * [[runningUserStats]] (the spec asserts both APIs emit the same rows);
    * state remains one small struct per active user. Requires the RocksDB
    * state store provider. */
  class RunningUserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), UserUpdate] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var stat: ValueState[UserStat] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stat = getHandle.getValueState[UserStat]("userStat",
        org.apache.spark.sql.Encoders.product[UserStat], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
                                 timerValues: TimerValues): Iterator[UserUpdate] = {
      val prev = if (stat.exists()) stat.get() else UserStat(0L, 0.0)
      val batch = rows.toSeq
      val next = UserStat(prev.n + batch.size, prev.sum + batch.map(_._2).sum)
      stat.update(next)
      Iterator.single(UserUpdate(user, next.n, next.sum))
    }
  }

  def runningUserStatsTws(events: org.apache.spark.sql.Dataset[
      (Long, Double)]): org.apache.spark.sql.Dataset[UserUpdate] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningUserStatsProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class UserTtlUpdate(user_id: Long, n_total: Long, n_recent: Long)

  /** ST6 run-artifact processor (exercised end-to-end by
    * [[graft.streaming.StreamRun]] scenario C): TWO named `ValueState`
    * handles on the same key — `totalCount` (TTLConfig.NONE; survives
    * micro-batches AND query restarts through the RocksDB store) and
    * `recentCount` (processing-time TTL — a per-user count that forgets
    * users idle longer than the TTL, the state-GC pattern that keeps the
    * store bounded by ACTIVE users at 100 TB/day volumes). Each input
    * batch emits the post-update pair, so a replay with a restart gap
    * longer than the TTL observes `n_total` persisting while `n_recent`
    * resets — TTL semantics as data, not just API surface. */
  class TtlUserCountProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), UserTtlUpdate] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var total: ValueState[Long] = _
    @transient private var recent: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      total = getHandle.getValueState[Long]("totalCount",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getValueState[Long]("recentCount",
        org.apache.spark.sql.Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    }
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
                                 timerValues: TimerValues): Iterator[UserTtlUpdate] = {
      val k = rows.size.toLong
      val t = (if (total.exists()) total.get() else 0L) + k
      val r = (if (recent.exists()) recent.get() else 0L) + k
      total.update(t)
      recent.update(r)
      Iterator.single(UserTtlUpdate(user, t, r))
    }
  }

  /** [[TtlUserCountProcessor]] as a readStream-ready transform. TTL
    * requires processing-time mode (expiry is wall-clock from the last
    * update). */
  def ttlUserCounts(ttlMs: Long)(events: org.apache.spark.sql.Dataset[
      (Long, Double)]): org.apache.spark.sql.Dataset[UserTtlUpdate] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TtlUserCountProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Stream-stream interval join (attribution): each purchase joins the
    * same user's clicks from the preceding 30 minutes. Both sides carry
    * watermarks so the join state is GC-able — the state bound every
    * stream-stream join needs at 100 TB/day event volumes. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "40 minutes")
    purchases.join(clicks,
      $"p_user" === $"c_user" &&
        $"c_ts" <= $"p_ts" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"))
      .select($"p_id", $"c_id", $"p_user".as("user_id"), $"p_ts", $"c_ts")
  }

  /** Stream-stream LEFT OUTER interval join: every purchase lands in
    * the output exactly once — attributed clicks attached, or emitted
    * with NULL click columns once the watermark PROVES no qualifying
    * click can still arrive. Outer emission is what makes the watermark
    * load-bearing for CORRECTNESS here (an inner stream-stream join
    * needs it only for state GC): the unmatched row is held in state
    * until the click-side watermark passes the purchase's 30-minute
    * lookback, then released in a later micro-batch. This is the
    * "every order must appear in the attribution table, matched or
    * not" production contract — the join a revenue pipeline actually
    * ships. */
  def purchaseAttributionLeft(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "40 minutes")
    purchases.join(clicks,
      $"p_user" === $"c_user" &&
        $"c_ts" <= $"p_ts" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"),
      "leftOuter")
      .select($"p_id", $"c_id", $"p_user".as("user_id"), $"p_ts", $"c_ts")
  }

  /** Stream-static enrichment: every micro-batch joins the static
    * dimension with a BROADCAST hash join — the standard "attach the
    * user/customer profile to the event stream" pattern. The static
    * side is planned once and re-used per batch; no stream state is
    * created (unlike stream-stream joins, there is nothing to
    * watermark), which is why this is the cheapest join a pipeline can
    * run at 100 TB/day event volumes. Inner semantics drop events
    * without a dim row; callers wanting passthrough use a left join the
    * same way. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Production sink shape: per-micro-batch parquet append via
    * foreachBatch — the standard exactly-once-per-batch landing pattern
    * (each batch is an atomic parquet commit keyed by batchId). */
  def sinkToParquet(df: DataFrame, path: String,
                    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(path)
      }
      .start()

  // ------------------------------------- batch-equivalent declared queries

  /** ST1 q_stream_tumbling — batch equivalent of [[tumblingCounts]]
    * (1h tumbling window ≡ date_trunc('hour')). */
  private def qStreamTumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), Det.sumd($"value").as("value_sum"))
      .select($"window.start".as("window_start"), $"event_type", $"n", $"value_sum")
      .orderBy($"window_start", $"event_type")
  }

  /** q_stream_topk — windowed trending-items: per 1-hour tumbling
    * window, the top-3 event types by count with their window share —
    * the canonical streaming leaderboard ("what's hot this hour").
    * Declared as the batch-equivalent form (oracle-checkable); a
    * streaming deployment ranks each completed window's rows in
    * foreachBatch over the SAME tumbling aggregate [[tumblingCounts]]
    * already proves end-to-end, so the stateful plumbing is shared.
    *
    * Determinism: counts are exact, ranking orders (n desc,
    * event_type), and the share is one round6'd rational. The rank
    * window partitions by WINDOW over the (window, type) CELL relation
    * — bounded by #types per window, never event rows. */
  private def qStreamTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val cells = Tables.load(s, dir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
    cells
      .withColumn("n_window",
        sum($"n").over(W.partitionBy($"window_start")))
      .withColumn("rn", row_number().over(
        W.partitionBy($"window_start").orderBy($"n".desc, $"event_type"))
        .cast("long"))
      .filter($"rn" <= 3)
      .select($"window_start", $"rn", $"event_type", $"n",
        Det.round6($"n".cast("double") / $"n_window").as("share"))
      .orderBy($"window_start", $"rn")
  }

  /** ST2 q_stream_sliding — batch equivalent of [[slidingCounts]]: every
    * event belongs to exactly 4 overlapping 1h windows at 15min slide. */
  private def qStreamSliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
      .orderBy($"window_start", $"event_type")
  }

  /** ST3 q_stream_session — batch equivalent of [[sessionCounts]]; the
    * DuckDB oracle replays it as gaps-and-islands (lag + cumulative sum)
    * with the same half-open boundary (gap >= 30min starts a new session,
    * session end = last event + gap). */
  private def qStreamSession(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"user_id", $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** q_stream_join — batch equivalent of [[purchaseAttribution]]: the
    * interval join semantics, oracle-checked (the streaming form adds
    * only the watermark state bound). */
  private def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id", $"ts".as("c_ts"))
    p.join(c, Seq("user_id"))
      .filter($"c_ts" <= $"p_ts" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"))
      .select($"p_id", $"c_id", $"user_id", $"p_ts", $"c_ts")
      .orderBy($"p_id", $"c_id")
  }

  /** ST9 q_stream_left_join — batch equivalent of
    * [[purchaseAttributionLeft]]: the same left-outer interval join,
    * oracle-checked; the streaming form adds watermark-gated outer-row
    * emission (StreamingSpec pins the null row arriving only after the
    * click watermark clears the purchase's lookback). Unmatched click
    * columns surface as `c_id = -1` / NULL `c_ts` — the -1 coalesce
    * keeps the total ORDER BY engine-agnostic (Spark sorts NULLs first,
    * DuckDB last; an order key must never be NULL, the §7.5.1
    * discipline). */
  private def qStreamLeftJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"),
        $"ts".as("c_ts"))
    p.join(c,
        $"user_id" === $"c_user" &&
          $"c_ts" <= $"p_ts" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"),
        "left")
      .select($"p_id", coalesce($"c_id", lit(-1L)).as("c_id"),
        $"user_id", $"p_ts", $"c_ts")
      .orderBy($"p_id", $"c_id")
  }

  /** q_funnel — ordered-sequence analytics (the event-analytics classic):
    * how many users progress click → view → purchase IN ORDER, each stage
    * strictly after the previous one's first occurrence. Three per-user
    * min-aggregations chained by time predicates — every stage is a
    * groupBy(user) with map-side combine and the joins are per-user
    * equi-joins, so the whole funnel shuffles O(users), never O(events²).
    * (The streaming analog is per-user state in [[runningUserStats]]'s
    * shape; this is the batch/oracle-checkable form.) */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
    val c = e.filter($"event_type" === "click")
      .groupBy($"user_id").agg(min($"ts").as("s1"))
    val v = c.join(e.filter($"event_type" === "view"), Seq("user_id"))
      .filter($"ts" > $"s1")
      .groupBy($"user_id").agg(min($"ts").as("s2"))
    val p = v.join(e.filter($"event_type" === "purchase"), Seq("user_id"))
      .filter($"ts" > $"s2")
      .groupBy($"user_id").agg(min($"ts").as("s3"))
    c.agg(count(lit(1)).as("n_users")).select(lit("1_click").as("stage"), $"n_users")
      .unionByName(v.agg(count(lit(1)).as("n_users"))
        .select(lit("2_view").as("stage"), $"n_users"))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), $"n_users"))
      .orderBy($"stage")
  }

  val queries: Map[String, Q] = Map(
    "q_funnel" -> (qFunnel _),
    "q_stream_join" -> (qStreamJoin _),
    "q_stream_left_join" -> (qStreamLeftJoin _),
    "q_stream_tumbling" -> (qStreamTumbling _),
    "q_stream_topk" -> (qStreamTopk _),
    "q_stream_sliding" -> (qStreamSliding _),
    "q_stream_session" -> (qStreamSession _))

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH c AS (
           SELECT user_id, min(ts) s1 FROM events
           WHERE event_type = 'click' GROUP BY user_id),
         v AS (
           SELECT c.user_id, min(e.ts) s2
           FROM c JOIN events e ON e.user_id = c.user_id
           WHERE e.event_type = 'view' AND e.ts > c.s1
           GROUP BY c.user_id),
         p AS (
           SELECT v.user_id, min(e.ts) s3
           FROM v JOIN events e ON e.user_id = v.user_id
           WHERE e.event_type = 'purchase' AND e.ts > v.s2
           GROUP BY v.user_id)
         SELECT '1_click' AS stage, count(*) AS n_users FROM c
         UNION ALL
         SELECT '2_view' AS stage, count(*) AS n_users FROM v
         UNION ALL
         SELECT '3_purchase' AS stage, count(*) AS n_users FROM p
         ORDER BY stage""",
    "q_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id,
                p.ts AS p_ts, c.ts AS c_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL 30 MINUTE
         ORDER BY p_id, c_id""",
    "q_stream_left_join" ->
      """SELECT p.event_id AS p_id,
                coalesce(c.event_id, -1) AS c_id, p.user_id,
                p.ts AS p_ts, c.ts AS c_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL 30 MINUTE
         ORDER BY p_id, c_id""",
    "q_stream_tumbling" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
                event_type, count(*) AS n, ${Det.SUMD("value")} AS value_sum
         FROM events
         GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q_stream_topk" ->
      s"""WITH c AS (
           SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) ws,
                  event_type, count(*) n
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT *, CAST(sum(n) OVER (PARTITION BY ws) AS BIGINT)
                       n_window,
                  row_number() OVER (PARTITION BY ws
                    ORDER BY n DESC, event_type) rn
           FROM c)
         SELECT ws AS window_start, CAST(rn AS BIGINT) AS rn,
                event_type, n,
                ${Det.ROUND6("CAST(n AS DOUBLE) / n_window")} AS share
         FROM w WHERE rn <= 3 ORDER BY window_start, rn""",
    "q_stream_sliding" ->
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                               - CAST(k AS BIGINT) * 900000000) AS window_start,
                event_type, count(*) AS n
         FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) g(k)
         GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q_stream_session" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, epoch_us(ts) us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) prev
           FROM events),
         y AS (
           SELECT user_id, ts, event_id, us,
                  CASE WHEN prev IS NULL OR us - prev >= 1800000000
                       THEN 1 ELSE 0 END brk
           FROM x),
         z AS (
           -- cumsum must use the SAME (ts, event_id) tie-break as the lag
           -- window: ordering by (ts, us) leaves same-timestamp rows at a
           -- session boundary in ambiguous order relative to the brk row
           SELECT user_id, ts,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    sess
           FROM y)
         SELECT min(ts) AS session_start,
                max(ts) + INTERVAL 30 MINUTE AS session_end,
                user_id, count(*) AS n_events
         FROM z GROUP BY user_id, sess ORDER BY user_id, session_start""")
}

package graft.operators

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window functions (SURVEY.md §2.5, all `E` — the reference has no
  * analytic constructs in its 258 LoC; these complete the north-star
  * relational surface). Every window is tie-broken to a total order
  * (`…, event_id` / `…, c_custkey`) so both engines rank identically.
  *
  * Scale: WindowExec shuffles once on the partition key and sorts within
  * partitions; per-user/per-nation partitions are small and uniformly
  * distributed in this schema, so no skew salting is needed. Frame sums go
  * through DECIMAL(18,4) — DuckDB evaluates sliding frames with a segment
  * tree whose addition order differs from Spark's running accumulation,
  * so float frame-sums would drift in the last ulp (Det.scala rationale).
  */
object Windows extends QueryModule {

  private val Dec = DecimalType(18, 4)

  /** W1 q_window_rank — row_number/rank/dense_rank per nation by balance. */
  private def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    graft.sources.Tables.load(s, dir, "customer")
      .select(
        $"c_custkey", $"c_nationkey", $"c_acctbal",
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .orderBy($"c_custkey")
  }

  /** W2 q_window_analytic — lag/lead/first/last over event time per user. */
  private def qWindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    graft.sources.Tables.load(s, dir, "events")
      .select(
        $"event_id", $"user_id", $"value",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        first($"value").over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("first_value"),
        last($"value").over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("last_value"))
      .orderBy($"event_id")
  }

  /** W3 q_window_frame — moving aggregate over a 3-row frame plus an
    * event-time RANGE frame in exact microseconds (`unix_micros` ↔ DuckDB
    * `epoch_us`; integer range arithmetic on both sides). */
  private def qWindowFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-2, Window.currentRow)
    val wr = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-600000000L, Window.currentRow)
    graft.sources.Tables.load(s, dir, "events")
      .select(
        $"event_id", $"user_id",
        sum($"value".cast(Dec)).over(w).cast(Dec).cast(DoubleType)
          .as("moving_sum"),
        count(lit(1)).over(w).as("frame_n"),
        count(lit(1)).over(wr).as("n_last_10min"))
      .orderBy($"event_id")
  }

  /** W4 q_topk_per_group — top-3 customers per nation (W1 + filter), the
    * "latest document per body" access pattern (SURVEY.md §2.5). At scale
    * this is the shuffle-once alternative to a global sort. */
  private def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    graft.sources.Tables.load(s, dir, "customer")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"c_nationkey", $"rn", $"c_custkey", $"c_acctbal")
      .orderBy($"c_nationkey", $"rn")
  }

  /** W5 q_window_distribution — ntile / percent_rank / cume_dist: the
    * distribution-rank family (quartile binning for stratification).
    * percent_rank = (rank−1)/(n−1) and cume_dist = |rows ≤ x|/n are exact
    * small-integer ratios — bit-identical across engines. */
  private def qWindowDistribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal", $"c_custkey")
    graft.sources.Tables.load(s, dir, "customer")
      .select(
        $"c_custkey", $"c_nationkey",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_window_distribution" -> (qWindowDistribution _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_analytic" -> (qWindowAnalytic _),
    "q_window_frame" -> (qWindowFrame _),
    "q_topk_per_group" -> (qTopkPerGroup _))

  val oracles: Map[String, String] = Map(
    "q_window_distribution" ->
      """SELECT c_custkey, c_nationkey,
                ntile(4) OVER w AS quartile,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cum_dist
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",
    "q_window_rank" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
                row_number() OVER w AS rn,
                rank() OVER w AS rnk,
                dense_rank() OVER w AS drnk
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_custkey""",
    "q_window_analytic" ->
      """SELECT event_id, user_id, value,
                lag(value, 1) OVER w AS prev_value,
                lead(value, 1) OVER w AS next_value,
                first_value(value) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS first_value,
                last_value(value) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS last_value
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "q_window_frame" ->
      """SELECT event_id, user_id,
                CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w
                     AS DECIMAL(18,4)) AS DOUBLE) AS moving_sum,
                count(*) OVER w AS frame_n,
                count(*) OVER
                  (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
                  AS n_last_10min
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_topk_per_group" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) t
         WHERE rn <= 3 ORDER BY c_nationkey, rn""")
}

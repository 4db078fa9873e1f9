package graft.operators

import graft.{Det, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** ML feature-engineering and model-evaluation operators (north-star
  * §2 extensions — the reference's 258 LoC has no modeling surface;
  * these are the aggregate-shaped "train/evaluate as a query" passes a
  * training-data team runs NEXT to curation: target encoding before a
  * GBM, AUC/calibration on a quality classifier's scores, a Benford
  * audit on ingested financials, PCA loadings over the embedding
  * store).
  *
  * Everything is expressed as scans + keyed aggregations — model state
  * (encodings, class priors, eigenvector iterates) is always a
  * GROUP-sized relation that BROADCASTS back onto fact rows, never a
  * fact-sized intermediate. Determinism follows the repo-wide t2
  * discipline: exact DECIMAL/BIGINT sums ([[Det]]), rationals kept as
  * integers until one final division, `round6` on every emitted score.
  */
object MlOps extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-doc ASCII-letter fraction on the 1e-6 grid — the shared
    * "classifier score" of [[qAuc]] and [[qCalibrationBins]] (an honest
    * stand-in model: e vs zh separates, de/es/fr overlap — exactly the
    * imperfect-classifier regime calibration/AUC exist for). One
    * codegen'd projection; the binary label rides along. */
  private def scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(
      $"doc_id", $"source",
      Det.round6(
        length(regexp_replace(lower($"text"), "[^a-z]", "")).cast(DoubleType)
          / length($"text").cast(DoubleType)).as("score"),
      when($"lang" === "en", 1L).otherwise(0L).as("pos"))
  }

  private val ScoredSql =
    """SELECT doc_id, source,
              floor(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                         AS DOUBLE)
                    / CAST(length(text) AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS score,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       FROM documents"""

  /** q_auc — ROC AUC of a classifier score, per corpus slice: the
    * model-evaluation pass every quality-filter deployment runs
    * (Mann–Whitney rank-sum form, tie-aware). Per (source, score) cell:
    * p positives, q negatives; U = Σ_cells p·(negatives strictly below
    * + q/2), AUC = U/(P·Q). The whole statistic stays INTEGER —
    * 2U = Σ p·(2·cum_neg_below + q) — until one final division, so
    * both engines hash identical bits with no float sums anywhere.
    *
    * Plan: one corpus scan → (source, score)-keyed partial-aggregated
    * groupBy (cells, not rows) → a source-partitioned cumulative window
    * over the CELL relation (distinct-score-sized, uniform) → one
    * G-row aggregate. At 100 TB the only fact-sized exchange is the
    * first combine; everything downstream is #distinct-scores rows. */
  private def qAuc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = scored(s, dir)
      .groupBy($"source", $"score")
      .agg(sum($"pos").as("p"), sum(lit(1L) - $"pos").as("q"))
    val w = Window.partitionBy($"source").orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("cumq", coalesce(sum($"q").over(w), lit(0L)))
      .groupBy($"source")
      .agg(sum($"p").cast(LongType).as("n_pos"),
        sum($"q").cast(LongType).as("n_neg"),
        sum($"p" * (lit(2L) * $"cumq" + $"q")).cast(LongType).as("u2"))
      .select($"source", $"n_pos", $"n_neg",
        when($"n_pos" > 0 && $"n_neg" > 0,
          Det.round6($"u2".cast(DoubleType)
            / (lit(2.0) * $"n_pos" * $"n_neg"))).as("auc"))
      .orderBy($"source")
  }

  /** q_calibration_bins — reliability diagram of the same score:
    * equal-width 2%-binned mean predicted score vs observed positive
    * rate plus
    * a per-bin Brier term, the standard "is the quality model's 0.8
    * actually 80%?" audit. Scores sit on the 1e-6 grid, so the mean is
    * an exact BIGINT sum ÷ (n·1e6); the Brier sum quantizes each
    * squared residual (exact IEEE: grid value minus 0/1, squared) to
    * 1e-12 before the integer sum. Equal-WIDTH bins (not ntile
    * deciles) on purpose: rank-based binning needs a global sort of
    * the corpus, width-based is one combine-all-the-way groupBy on a
    * 50-value key — at 100 TB this is a single fact-combine into ≤50
    * rows. */
  private def qCalibrationBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q6 = floor($"score" * lit(1000000.0) + lit(0.5)).cast(LongType)
    val resid = $"score" - $"pos".cast(DoubleType)
    scored(s, dir)
      .withColumn("bin", least(floor($"score" * lit(50.0)), lit(49.0))
        .cast(LongType))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"pos").cast(LongType).as("n_pos"),
        sum(q6).as("sq6"),
        sum(floor(resid * resid * lit(1000000000000.0) + lit(0.5))
          .cast(LongType)).as("sb12"))
      .select($"bin", $"n", $"n_pos",
        ($"sq6".cast(DoubleType) / ($"n" * lit(1000000.0)))
          .as("mean_score"),
        Det.round6($"n_pos".cast(DoubleType) / $"n").as("pos_rate"),
        ($"sb12".cast(DoubleType) / ($"n" * lit(1000000000000.0)))
          .as("brier"))
      .orderBy($"bin")
  }

  /** q_target_encoding — leave-one-out smoothed mean-target encoding of
    * a categorical (c_mktsegment → customer revenue), the classic
    * pre-GBM feature transform (Micci-Barreca 2001). LOO removes the
    * row's own target from its segment mean — the leakage guard that
    * distinguishes this from a plain per-group average — and smoothing
    * (m=10) shrinks small segments toward the global mean:
    * enc_i = (seg_sum − own_i + m·ḡ) / (seg_n − 1 + m).
    *
    * Plan: fact combines to a per-customer DECIMAL-exact revenue (the
    * only fact-sized exchange), left-joined onto the customer dim
    * (no-order customers encode with own=0, still counted); segment
    * stats (G=5 rows) and the global mean (1 row) ride back by
    * broadcast. Numerators stay on the 1e-4 revenue grid as BIGINTs;
    * the encoding is one double expression with identical association
    * on both engines, round6'd. */
  private def qTargetEncoding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = t(s, dir, "orders").groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast(graft.operators.MlOps.Dec))
        .cast(graft.operators.MlOps.Dec).as("rev"))
    val cust = t(s, dir, "customer")
      .join(rev, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_mktsegment",
        coalesce(($"rev" * lit(10000)).cast(LongType), lit(0L)).as("rq"))
    val seg = cust.groupBy($"c_mktsegment".as("seg"))
      .agg(count(lit(1)).as("seg_n"), sum($"rq").as("seg_sq"))
    val glob = seg.agg(sum($"seg_n").as("g_n"), sum($"seg_sq").as("g_sq"))
    cust
      .join(broadcast(seg), $"c_mktsegment" === $"seg")
      .crossJoin(broadcast(glob))
      .select($"c_custkey", $"c_mktsegment",
        ($"rq".cast(DoubleType) / lit(10000.0)).as("cust_rev"),
        $"seg_n",
        Det.round6(
          (($"seg_sq" - $"rq").cast(DoubleType) / lit(10000.0)
            + lit(10.0) * ($"g_sq".cast(DoubleType)
              / lit(10000.0) / $"g_n".cast(DoubleType)))
            / (($"seg_n" - lit(1L) + lit(10L)).cast(DoubleType)))
          .as("enc"))
      .orderBy($"c_custkey")
  }

  /** q_benford — first-significant-digit audit of o_totalprice against
    * Benford's law, the forensic screen a pipeline runs on ingested
    * financial columns (Nigrini 2012). The digit comes from the
    * INTEGER-STRING prefix (both engines render BIGINT identically) —
    * never from floor(log10(x)), whose last-ulp disagreement at powers
    * of ten would mis-bin. Expected mass log10(1+1/d) is irrational, so
    * engine-native log10 is safe under round6; observed−expected stays
    * exact (both already on the 1e-6 grid). One scan combining into 9
    * rows; the total rides the digit relation as a whole-relation
    * window (free at 9 rows — the q_unigram_logprob pattern). */
  private def qBenford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val digit = substring(floor($"o_totalprice").cast(LongType)
      .cast("string"), 1, 1).cast(LongType)
    t(s, dir, "orders")
      .select(digit.as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
      .withColumn("n_total", sum($"n").over(Window.partitionBy()))
      .select($"digit", $"n",
        Det.round6($"n".cast(DoubleType) / $"n_total").as("obs_freq"),
        Det.round6(log10(lit(1.0) + lit(1.0) / $"digit")).as("exp_freq"),
        (Det.round6($"n".cast(DoubleType) / $"n_total")
          - Det.round6(log10(lit(1.0) + lit(1.0) / $"digit"))).as("dev"))
      .orderBy($"digit")
  }

  val queries: Map[String, Q] = Map(
    "q_auc" -> (qAuc _),
    "q_calibration_bins" -> (qCalibrationBins _),
    "q_target_encoding" -> (qTargetEncoding _),
    "q_benford" -> (qBenford _))

  val oracles: Map[String, String] = Map(
    "q_auc" ->
      s"""WITH s AS ($ScoredSql),
         cells AS (
           SELECT source, score, CAST(sum(pos) AS BIGINT) p,
                  CAST(sum(1 - pos) AS BIGINT) q
           FROM s GROUP BY source, score),
         c AS (
           SELECT *, COALESCE(CAST(sum(q) OVER (PARTITION BY source
                       ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) cumq
           FROM cells),
         g AS (
           SELECT source, CAST(sum(p) AS BIGINT) n_pos,
                  CAST(sum(q) AS BIGINT) n_neg,
                  CAST(sum(p * (2 * cumq + q)) AS BIGINT) u2
           FROM c GROUP BY source)
         SELECT source, n_pos, n_neg,
                CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                  ${Det.ROUND6("CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg)")}
                END AS auc
         FROM g ORDER BY source""",
    "q_calibration_bins" ->
      s"""WITH s AS ($ScoredSql)
         SELECT CAST(least(floor(score * 50.0), 49.0) AS BIGINT) AS bin,
                count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
                CAST(sum(CAST(floor(score * 1000000.0 + 0.5) AS BIGINT))
                     AS DOUBLE) / (count(*) * 1000000.0) AS mean_score,
                ${Det.ROUND6("CAST(sum(pos) AS DOUBLE) / count(*)")}
                  AS pos_rate,
                CAST(sum(CAST(floor((score - pos) * (score - pos)
                              * 1000000000000.0 + 0.5) AS BIGINT))
                     AS DOUBLE) / (count(*) * 1000000000000.0) AS brier
         FROM s GROUP BY 1 ORDER BY bin""",
    "q_target_encoding" ->
      """WITH rev AS (
           SELECT o_custkey,
                  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                            AS DECIMAL(18,4)) * 10000 AS BIGINT) rq
           FROM orders GROUP BY o_custkey),
         cust AS (
           SELECT c_custkey, c_mktsegment, COALESCE(rq, 0) rq
           FROM customer LEFT JOIN rev ON c_custkey = o_custkey),
         seg AS (
           SELECT c_mktsegment seg, count(*) seg_n,
                  CAST(sum(rq) AS BIGINT) seg_sq
           FROM cust GROUP BY c_mktsegment),
         gstats AS (
           SELECT CAST(sum(seg_n) AS BIGINT) g_n,
                  CAST(sum(seg_sq) AS BIGINT) g_sq
           FROM seg)
         SELECT c_custkey, c_mktsegment,
                CAST(rq AS DOUBLE) / 10000.0 AS cust_rev, seg_n,
                floor(((CAST(seg_sq - rq AS DOUBLE) / 10000.0
                        + 10.0 * (CAST(g_sq AS DOUBLE) / 10000.0
                                  / CAST(g_n AS DOUBLE)))
                       / CAST(seg_n - 1 + 10 AS DOUBLE))
                      * 1000000.0 + 0.5) / 1000000.0 AS enc
         FROM cust JOIN seg ON c_mktsegment = seg CROSS JOIN gstats
         ORDER BY c_custkey""",
    "q_benford" ->
      s"""WITH d AS (
           SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) digit
           FROM orders),
         g AS (SELECT digit, count(*) n FROM d GROUP BY digit),
         w AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) n_total FROM g)
         SELECT digit, n,
                ${Det.ROUND6("CAST(n AS DOUBLE) / n_total")} AS obs_freq,
                ${Det.ROUND6("log10(1.0 + 1.0 / digit)")} AS exp_freq,
                (${Det.ROUND6("CAST(n AS DOUBLE) / n_total")}
                 - ${Det.ROUND6("log10(1.0 + 1.0 / digit)")}) AS dev
         FROM w ORDER BY digit""")

  private[operators] val Dec =
    org.apache.spark.sql.types.DecimalType(18, 4)
}

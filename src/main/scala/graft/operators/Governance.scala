package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance operators (round 9, north-star extension next to
  * [[Curation]]'s `q_gdpr_delete`): the privacy/compliance audits a
  * 100 TB data platform runs before releasing or retaining data —
  * k-anonymity / l-diversity risk audit, differentially-private
  * aggregate release, and PII detection + masking.
  *
  * The fixtures carry no real PII (synthetic TPC-H-ish names and
  * word-soup documents), so `q_pii_detect`'s haystack is derived
  * deterministically from customer keys — the same honest stand-in
  * posture as the [[Graphs]] link graph and the `q_lang_id` profiles;
  * the OPERATOR machinery (multi-class regex detection, masking,
  * per-cohort risk accounting) is the real thing and is what the
  * oracle replays.
  *
  * Determinism: k-anonymity is all-integer; the DP noise draws its
  * uniforms from md5 of the group key (the repo-wide content-hash
  * stance — reproducible, resumable, engine-agnostic) and quantizes
  * immediately after the single ln per draw, the [[graft.Det]]
  * transcendental discipline.
  */
object Governance extends QueryModule {

  /** q_kanonymity — k-anonymity / l-diversity audit: group the customer
    * table by its quasi-identifier tuple (nation, market segment) and
    * report, per equivalence class, the class size n, whether it meets
    * k = 10 (a class smaller than k re-identifies its members), the
    * l-diversity of the sensitive attribute (distinct account-balance
    * bands — a class whose members all share one band leaks the value
    * even when n ≥ k), and the worst-case re-identification risk 1/n.
    * The audit a platform runs before publishing a "de-identified"
    * extract.
    *
    * Scale: ONE scan, one map-side-combinable aggregate keyed by the
    * QI tuple (the distinct-band count is a two-level partial
    * aggregate); output is |QI-space| rows — bounded by the attribute
    * vocabulary, never fact-sized. */
  private def qKanonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .select($"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"),
        floor($"c_acctbal" / lit(1000.0)).cast("long").as("band"))
      .groupBy($"nation", $"segment")
      .agg(count(lit(1)).as("n"),
        countDistinct($"band").as("l_div"))
      .select($"nation", $"segment", $"n", $"l_div",
        ($"n" >= 10L).as("k_anon"),
        graft.Det.round6(lit(1.0) / $"n".cast("double"))
          .as("reident_risk"))
      .orderBy($"nation", $"segment")
  }

  /** 52-bit md5 dyadic uniform u ∈ (0, 1] of `e` salted with `salt`:
    * (h + 1) / 2^52 with h the first 13 md5 hex digits — exactly
    * representable in both engines, so `ln` sees identical bits (the
    * [[Curation]] Efraimidis-sampling idiom). */
  private def mdUniform(e: String, salt: String) =
    (expr(s"CAST(conv(substr(md5(concat($e, '$salt')), 1, 13), " +
      "16, 10) AS BIGINT)") + lit(1L)).cast("double") /
      lit(4503599627370496.0)

  /** q_dp_release — Laplace-mechanism count release (the ε = 1 DP
    * SHAPE): per-event-type counts perturbed with Laplace(1/ε) noise
    * before publication. The Laplace draw is the difference of two
    * exponentials, −b·ln(u₁) + b·ln(u₂) with independent uniforms (no
    * branch, no ln(0) edge); uniforms are md5-derived and the noise is
    * quantized to 1e-6 right after the two lns, so `released = n +
    * noise` is exact integer-plus-quantum arithmetic in both engines.
    * `n_true` is emitted for the oracle gate only; a production release
    * ships the `released` column alone.
    *
    * PRIVACY CAVEAT (this instantiation is NOT formally DP): the
    * uniforms are seeded from md5(event_type) — a deterministic
    * function of the PUBLISHED group key — so anyone can recompute the
    * noise and recover n_true exactly from `released`. Key-seeded
    * determinism is deliberate here (oracle-checkable, republishable,
    * engine-agnostic — the repo-wide content-hash stance) but it voids
    * the differential-privacy guarantee entirely; a production release
    * must draw the uniforms from a SECRET, non-republishable seed
    * (e.g. a per-release random salt held by the curator), with
    * everything else — the mechanism, scale, quantization — unchanged.
    *
    * Scale: one map-side-combined G-row aggregate; the noise is G
    * scalar expressions. Nothing else touches the fact. */
  private def qDpRelease(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = 1.0 // Laplace scale = sensitivity/ε = 1/1
    Tables.load(s, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise_q",
        floor((log(mdUniform("event_type", "|dp2"))
          - log(mdUniform("event_type", "|dp1"))) * lit(b)
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select($"event_type", $"n_true", lit(1.0).as("epsilon"),
        ($"noise_q".cast("double") / lit(1000000.0)).as("noise"),
        ($"n_true".cast("double")
          + $"noise_q".cast("double") / lit(1000000.0)).as("released"))
      .orderBy($"event_type")
  }

  /** q_dp_release_sum — bounded-contribution Laplace SUM release (the
    * real DP-SQL shape, widening [[qDpRelease]]'s count mechanism):
    * each subject's (user's) total `value` contribution per event type
    * is CLAMPED to ±C (C = 500.00), the clamped contributions are
    * summed, and Laplace(C/ε) noise (ε = 1; sensitivity = C BY the
    * clamp) perturbs the published sum. Counts have sensitivity 1 by
    * construction; sums are unbounded until the per-subject clamp —
    * the clamp IS the mechanism. `n_subjects`/`sum_true` are emitted
    * for the oracle gate only; a production release ships `released`.
    *
    * Determinism: `value` carries 2 decimals, so per-user totals run
    * in integer cents (the quantized-BIGINT sum discipline — order-
    * independent and bit-identical in both engines); the clamp is
    * integer; the Laplace draw is the same md5-seeded quantized
    * difference-of-exponentials as [[qDpRelease]] and shares its
    * PRIVACY CAVEAT (key-seeded determinism voids formal DP; a
    * production release draws from a secret seed).
    *
    * Scale: two-level aggregate — the (event_type, user_id) partial is
    * map-side-combined before its one fact-keyed shuffle; the second
    * exchange carries |types|·|users-per-type| pre-combined rows and
    * the output is |types|. The per-subject aggregation is inherent to
    * bounded-contribution DP, not an implementation choice. */
  private def qDpReleaseSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cCents = 50000L // clamp bound C = 500.00, in cents
    val b = 500.0       // Laplace scale = C/ε = 500/1
    Tables.load(s, dir, "events")
      .select($"event_type", $"user_id",
        floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy($"event_type", $"user_id")
      .agg(sum($"cents").as("user_cents"))
      .select($"event_type",
        greatest(least($"user_cents", lit(cCents)), lit(-cCents))
          .as("clamped"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_subjects"),
        sum($"clamped").as("sum_cents"))
      .withColumn("noise_q",
        floor((log(mdUniform("event_type", "|dps2"))
          - log(mdUniform("event_type", "|dps1"))) * lit(b)
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select($"event_type", $"n_subjects",
        ($"sum_cents".cast("double") / lit(100.0)).as("sum_true"),
        lit(1.0).as("epsilon"), lit(500.0).as("clamp_c"),
        ($"noise_q".cast("double") / lit(1000000.0)).as("noise"),
        ($"sum_cents".cast("double") / lit(100.0)
          + $"noise_q".cast("double") / lit(1000000.0)).as("released"))
      .orderBy($"event_type")
  }

  /** q_dp_release_hist — bounded-contribution Laplace HISTOGRAM release
    * (the census/DP-SQL shape beside [[qDpRelease]]'s count and
    * [[qDpReleaseSum]]'s clamped sum, completing the DP release
    * family): `value` buckets into fixed 50-unit bins (integer-cents
    * arithmetic, so the bin edge is exact in both engines), each
    * subject (user) contributes AT MOST ONCE per bin (distinct
    * presence, L∞ = 1) and to AT MOST L0 = 3 bins (per-user rank by
    * event count, deterministic tie-break — the contribution-bounding
    * clamp), and each bin's subject count is perturbed with
    * Laplace(L0·L∞/ε) = Laplace(3) noise before publication.
    * Sensitivity IS the clamp product: one user's removal changes at
    * most L0 bins by at most 1 each. `n_subjects` is emitted for the
    * oracle gate only; a production release ships `released`.
    *
    * Shares [[qDpRelease]]'s PRIVACY CAVEAT verbatim: md5(bin)-seeded
    * noise is deterministic in the published key, which voids the
    * formal ε guarantee — a production release swaps in a secret
    * per-release salt, mechanism unchanged.
    *
    * Scale: the (user, bin) distinct-presence aggregate map-side
    * combines before its one fact-keyed shuffle; the L0 rank window
    * partitions by user over ≤|bins| rows each (never event rows); the
    * output is |bins|. */
  private def qDpReleaseHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l0 = 3
    val b = 3.0 // Laplace scale = L0·L∞/ε = 3·1/1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"n_ev".desc, $"bin")
    Tables.load(s, dir, "events")
      .select($"user_id",
        (floor($"value" * lit(100.0) + lit(0.5)).cast("long") / lit(5000L))
          .cast("long").as("bin"))
      .groupBy($"user_id", $"bin")
      .agg(count(lit(1)).as("n_ev"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= l0)
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_subjects"))
      .withColumn("noise_q",
        floor((log(mdUniform("CAST(bin AS STRING)", "|dph2"))
          - log(mdUniform("CAST(bin AS STRING)", "|dph1"))) * lit(b)
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select($"bin", $"n_subjects", lit(1.0).as("epsilon"),
        lit(3L).as("l0_bound"),
        ($"noise_q".cast("double") / lit(1000000.0)).as("noise"),
        ($"n_subjects".cast("double")
          + $"noise_q".cast("double") / lit(1000000.0)).as("released"))
      .orderBy($"bin")
  }

  /** q_dp_release_quantile — DP QUANTILE release by noisy-histogram CDF
    * inversion (the standard post-processing route: quantiles derived
    * from an already-released DP histogram cost NO extra privacy
    * budget): the [[qDpReleaseHist]] mechanism re-runs with its own
    * salt, the noisy bin counts are kept in exact INTEGER micro-units
    * (n·10⁶ + noise_q — cumulative sums stay order-independent and
    * bit-identical in both engines), and each requested quantile q ∈
    * {25%, 50%, 90%} releases the smallest bin whose cumulative noisy
    * mass reaches q of the total (threshold compared as
    * 100·cum ≥ qpct·total, all BIGINT — no float in the decision).
    * Released value = the bin's lower edge in value units.
    *
    * Same PRIVACY CAVEAT as the rest of the family (md5-keyed noise is
    * republishable but voids formal ε; production uses a secret salt).
    *
    * Scale: everything after the (user,bin) pre-combined aggregate is
    * |bins|-sized (≤10 rows, a FIXED vocabulary) — the histogram packs
    * into ONE sorted array row and the CDF inversion is an integer
    * array fold (`aggregate` HOF) per quantile: no join, no extra
    * exchange, three stages end to end. The pack is bounded by the bin
    * vocabulary, never the data (the q_rfm sorted-collect discipline). */
  private def qDpReleaseQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l0 = 3
    val b = 3.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"n_ev".desc, $"bin")
    val hist = Tables.load(s, dir, "events")
      .select($"user_id",
        (floor($"value" * lit(100.0) + lit(0.5)).cast("long") / lit(5000L))
          .cast("long").as("bin"))
      .groupBy($"user_id", $"bin")
      .agg(count(lit(1)).as("n_ev"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= l0)
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_subjects"))
      .withColumn("noise_q",
        floor((log(mdUniform("CAST(bin AS STRING)", "|dpq2"))
          - log(mdUniform("CAST(bin AS STRING)", "|dpq1"))) * lit(b)
          * lit(1000000.0) + lit(0.5)).cast("long"))
      // exact integer micro-units: the CDF arithmetic never sees a float
      .select($"bin",
        ($"n_subjects" * lit(1000000L) + $"noise_q").as("rel_micro"))
    hist
      .agg(sort_array(collect_list(struct($"bin", $"rel_micro"))).as("h"))
      .select(explode(array(lit(25L), lit(50L), lit(90L))).as("qpct"), $"h")
      .withColumn("tot",
        expr("aggregate(h, 0L, (acc, x) -> acc + x.rel_micro)"))
      // first bin whose cumulative micro-mass reaches qpct% of the
      // total: one left-to-right integer fold over the ≤10-entry array
      .withColumn("bin", expr(
        """aggregate(h,
             named_struct('cum', 0L, 'found', CAST(-1 AS BIGINT)),
             (acc, x) -> named_struct(
               'cum', acc.cum + x.rel_micro,
               'found', CASE
                 WHEN acc.found >= 0 THEN acc.found
                 WHEN (acc.cum + x.rel_micro) * 100 >= qpct * tot
                   THEN x.bin
                 ELSE CAST(-1 AS BIGINT) END),
             acc -> acc.found)"""))
      .select($"qpct", $"bin",
        ($"bin".cast("double") * lit(50.0)).as("value_lo"),
        lit(1.0).as("epsilon"), lit(3L).as("l0_bound"))
      .orderBy($"qpct")
  }

  /** q_pseudonymize — keyed pseudonymization (the GDPR Art. 4(5)
    * technique beside [[Curation]]'s `q_gdpr_delete` erasure and
    * [[qPiiDetect]]'s masking): direct identifiers are replaced by a
    * keyed one-way token `substr(md5(user_id || salt), 1, 16)` so the
    * released events remain JOINABLE on the pseudonym (longitudinal
    * analysis still works) while the identifier itself never ships.
    * The release carries per-pseudonym activity only; re-linking
    * requires the salt.
    *
    * HONESTY — same stance as the DP family: the salt here is a pinned
    * literal so the oracle can replay the tokens; a production release
    * holds the salt SECRET (an HMAC key in the curator's KMS), with the
    * token arithmetic unchanged. With a public salt the mapping is
    * enumerable for small id spaces (it's exactly the k-anonymity
    * linkage-attack surface [[qKanonymity]] audits).
    *
    * Scale: one scan, the token is a codegen'd projection, one
    * map-side-combined aggregate keyed by the (uniform) token. */
  private def qPseudonymize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(
        substring(md5(concat($"user_id".cast("string"),
          lit("|graft-pseud-v1"))), 1, 16).as("pseudo_id"),
        $"value", $"event_type")
      .groupBy($"pseudo_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"),
        graft.Det.sumd($"value").as("total_value"))
      .orderBy($"pseudo_id")
  }

  /** Synthetic per-customer profile string: name plus PII-shaped
    * contact fields planted on deterministic key residues (email on
    * custkey ≡ 0 mod 3, phone on ≡ 0 mod 2, a 16-digit PAN on ≡ 0
    * mod 5) — so the detector sees a MIX of clean and dirty rows, not
    * a constant hit rate. */
  private def profileCol = {
    val k = col("c_custkey")
    concat(
      col("c_name"),
      when(k % 3 === 0,
        concat(lit(" <"), lower(col("c_mktsegment")),
          k.cast("string"), lit("@example.com>"))).otherwise(lit("")),
      when(k % 2 === 0,
        concat(lit(" tel "), lpad((k % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(((k * 7) % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(((k * 13) % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(k % 5 === 0,
        concat(lit(" card "), lpad(k.cast("string"), 16, "9")))
        .otherwise(lit("")))
  }

  // The TLD dot is a character class, NOT `\.`: Spark's SQL-literal
  // lexer (expr("regexp_count(…, '…\\.…')"), default
  // escapedStringLiterals=false) unescapes `\.` to a bare any-char `.`,
  // while the Column-function masking path and the DuckDB oracle see a
  // literal `\.` — three subtly different regexes. `[.]` lexes
  // identically everywhere.
  private val EmailRe = "[a-z0-9._]+@[a-z0-9.]+[.][a-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val CardRe = "[0-9]{16}"

  /** q_pii_detect — PII detection + masking audit: three regex
    * detector classes (email, phone, payment-card PAN) sweep a
    * free-text profile field; every hit class is counted and the
    * masked form (class tokens substituted) is measured, reported per
    * market-segment cohort: rows scanned, hits per class, clean rows,
    * the cohort's PII incidence rate, and the total characters the
    * masking pass removes. The pre-release scrub audit next to
    * [[Curation]]'s `q_scrub_text` (which normalizes) and
    * `q_gdpr_delete` (which erases by subject).
    *
    * Detector order matters for masking: the PAN class is masked
    * FIRST, else the phone regex could match inside a longer digit
    * run; with the dash-delimited phone shape the classes are
    * disjoint, and the oracle replays the same order.
    *
    * Scale: ONE scan; detection and masking are codegen'd projections;
    * the only exchange carries |segments| partial-agg rows. */
  private def qPiiDetect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val masked = regexp_replace(regexp_replace(regexp_replace(
      col("profile"), CardRe, "<PAN>"), EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    Tables.load(s, dir, "customer")
      .withColumn("profile", profileCol)
      .select($"c_mktsegment".as("segment"),
        expr(s"CAST(regexp_count(profile, '$EmailRe') AS BIGINT)")
          .as("e"),
        expr(s"CAST(regexp_count(profile, '$PhoneRe') AS BIGINT)")
          .as("p"),
        expr(s"CAST(regexp_count(profile, '$CardRe') AS BIGINT)")
          .as("c"),
        (length($"profile") - length(masked)).cast("long").as("cut"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_rows"),
        sum($"e").as("n_email"),
        sum($"p").as("n_phone"),
        sum($"c").as("n_card"),
        sum(when($"e" + $"p" + $"c" === 0L, 1L).otherwise(0L))
          .as("n_clean"),
        sum($"cut").as("masked_chars"))
      .select($"segment", $"n_rows", $"n_email", $"n_phone", $"n_card",
        $"n_clean",
        graft.Det.round6(($"n_rows" - $"n_clean").cast("double")
          / $"n_rows".cast("double")).as("pii_rate"),
        $"masked_chars")
      .orderBy($"segment")
  }

  val queries: Map[String, Q] = Map(
    "q_kanonymity" -> (qKanonymity _),
    "q_dp_release" -> (qDpRelease _),
    "q_dp_release_sum" -> (qDpReleaseSum _),
    "q_dp_release_hist" -> (qDpReleaseHist _),
    "q_dp_release_quantile" -> (qDpReleaseQuantile _),
    "q_pseudonymize" -> (qPseudonymize _),
    "q_pii_detect" -> (qPiiDetect _))

  /** DuckDB replay of [[mdUniform]]'s 52-bit md5 numerator. */
  private def duckHash(e: String, salt: String): String =
    s"""CAST(list_reduce(
       |   list_prepend('0', string_split(substr(md5($e || '$salt'), 1, 13), '')),
       |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 +
       |     instr('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT)"""
      .stripMargin

  /** The profile builder replayed in DuckDB (lpad/concat/CASE parity
    * with [[profileCol]]). */
  private val ProfileSql =
    """c_name
      || CASE WHEN c_custkey % 3 = 0
              THEN ' <' || lower(c_mktsegment)
                   || CAST(c_custkey AS VARCHAR) || '@example.com>'
              ELSE '' END
      || CASE WHEN c_custkey % 2 = 0
              THEN ' tel ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
                   || '-' || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0')
                   || '-' || lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0')
              ELSE '' END
      || CASE WHEN c_custkey % 5 = 0
              THEN ' card ' || lpad(CAST(c_custkey AS VARCHAR), 16, '9')
              ELSE '' END"""

  val oracles: Map[String, String] = Map(
    "q_kanonymity" ->
      s"""SELECT CAST(c_nationkey AS BIGINT) AS nation,
                c_mktsegment AS segment,
                count(*) AS n,
                CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                     AS BIGINT) AS l_div,
                count(*) >= 10 AS k_anon,
                ${graft.Det.ROUND6("1.0 / count(*)")} AS reident_risk
         FROM customer
         GROUP BY c_nationkey, c_mktsegment
         ORDER BY nation, segment""",
    "q_dp_release" ->
      s"""WITH g AS (
           SELECT event_type, count(*) AS n_true FROM events
           GROUP BY event_type),
         u AS (
           SELECT event_type, n_true,
                  (CAST(${duckHash("event_type", "|dp2")} AS DOUBLE) + 1)
                    / 4503599627370496.0 AS u2,
                  (CAST(${duckHash("event_type", "|dp1")} AS DOUBLE) + 1)
                    / 4503599627370496.0 AS u1
           FROM g),
         q AS (
           SELECT event_type, n_true,
                  CAST(floor((ln(u2) - ln(u1)) * 1.0 * 1000000.0 + 0.5)
                       AS BIGINT) AS noise_q
           FROM u)
         SELECT event_type, n_true, 1.0 AS epsilon,
                CAST(noise_q AS DOUBLE) / 1000000.0 AS noise,
                CAST(n_true AS DOUBLE)
                  + CAST(noise_q AS DOUBLE) / 1000000.0 AS released
         FROM q ORDER BY event_type""",
    "q_dp_release_sum" ->
      s"""WITH pc AS (
           SELECT event_type, user_id,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
           FROM events),
         pu AS (
           SELECT event_type, user_id, SUM(cents) AS user_cents
           FROM pc GROUP BY event_type, user_id),
         cl AS (
           SELECT event_type,
                  greatest(least(user_cents, 50000), -50000) AS clamped
           FROM pu),
         g AS (
           SELECT event_type, count(*) AS n_subjects,
                  CAST(sum(clamped) AS BIGINT) AS sum_cents
           FROM cl GROUP BY event_type),
         u AS (
           SELECT event_type, n_subjects, sum_cents,
                  (CAST(${duckHash("event_type", "|dps2")} AS DOUBLE) + 1)
                    / 4503599627370496.0 AS u2,
                  (CAST(${duckHash("event_type", "|dps1")} AS DOUBLE) + 1)
                    / 4503599627370496.0 AS u1
           FROM g),
         q AS (
           SELECT event_type, n_subjects, sum_cents,
                  CAST(floor((ln(u2) - ln(u1)) * 500.0 * 1000000.0 + 0.5)
                       AS BIGINT) AS noise_q
           FROM u)
         SELECT event_type, n_subjects,
                CAST(sum_cents AS DOUBLE) / 100.0 AS sum_true,
                1.0 AS epsilon, 500.0 AS clamp_c,
                CAST(noise_q AS DOUBLE) / 1000000.0 AS noise,
                CAST(sum_cents AS DOUBLE) / 100.0
                  + CAST(noise_q AS DOUBLE) / 1000000.0 AS released
         FROM q ORDER BY event_type""",
    "q_dp_release_hist" ->
      s"""WITH pb AS (
           SELECT user_id,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 5000 AS bin
           FROM events),
         ub AS (
           SELECT user_id, bin, count(*) AS n_ev
           FROM pb GROUP BY user_id, bin),
         rk AS (
           SELECT user_id, bin,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY n_ev DESC, bin) AS rk
           FROM ub),
         g AS (
           SELECT bin, count(*) AS n_subjects
           FROM rk WHERE rk <= 3 GROUP BY bin),
         u AS (
           SELECT bin, n_subjects,
                  (CAST(${duckHash("CAST(bin AS VARCHAR)", "|dph2")}
                     AS DOUBLE) + 1) / 4503599627370496.0 AS u2,
                  (CAST(${duckHash("CAST(bin AS VARCHAR)", "|dph1")}
                     AS DOUBLE) + 1) / 4503599627370496.0 AS u1
           FROM g),
         q AS (
           SELECT bin, n_subjects,
                  CAST(floor((ln(u2) - ln(u1)) * 3.0 * 1000000.0 + 0.5)
                       AS BIGINT) AS noise_q
           FROM u)
         SELECT bin, n_subjects, 1.0 AS epsilon,
                CAST(3 AS BIGINT) AS l0_bound,
                CAST(noise_q AS DOUBLE) / 1000000.0 AS noise,
                CAST(n_subjects AS DOUBLE)
                  + CAST(noise_q AS DOUBLE) / 1000000.0 AS released
         FROM q ORDER BY bin""",
    "q_dp_release_quantile" ->
      s"""WITH pb AS (
           SELECT user_id,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 5000 AS bin
           FROM events),
         ub AS (
           SELECT user_id, bin, count(*) AS n_ev
           FROM pb GROUP BY user_id, bin),
         rk AS (
           SELECT user_id, bin,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY n_ev DESC, bin) AS rk
           FROM ub),
         g AS (
           SELECT bin, count(*) AS n_subjects
           FROM rk WHERE rk <= 3 GROUP BY bin),
         u AS (
           SELECT bin, n_subjects,
                  (CAST(${duckHash("CAST(bin AS VARCHAR)", "|dpq2")}
                     AS DOUBLE) + 1) / 4503599627370496.0 AS u2,
                  (CAST(${duckHash("CAST(bin AS VARCHAR)", "|dpq1")}
                     AS DOUBLE) + 1) / 4503599627370496.0 AS u1
           FROM g),
         h AS (
           SELECT bin,
                  n_subjects * 1000000
                    + CAST(floor((ln(u2) - ln(u1)) * 3.0 * 1000000.0 + 0.5)
                           AS BIGINT) AS rel_micro
           FROM u),
         t AS (SELECT CAST(sum(rel_micro) AS BIGINT) AS tot_micro FROM h),
         cum AS (
           SELECT a.bin, CAST(sum(c.rel_micro) AS BIGINT) AS cum_micro
           FROM h a JOIN h c ON c.bin <= a.bin GROUP BY a.bin),
         qs AS (SELECT * FROM (VALUES (CAST(25 AS BIGINT)),
                  (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT))) v(qpct))
         SELECT qpct, min(cum.bin) AS bin,
                CAST(min(cum.bin) AS DOUBLE) * 50.0 AS value_lo,
                1.0 AS epsilon, CAST(3 AS BIGINT) AS l0_bound
         FROM cum, t, qs
         WHERE cum_micro * 100 >= qpct * tot_micro
         GROUP BY qpct ORDER BY qpct""",
    "q_pseudonymize" ->
      s"""SELECT substr(md5(CAST(user_id AS VARCHAR) || '|graft-pseud-v1'),
                 1, 16) AS pseudo_id,
                count(*) AS n_events,
                count(DISTINCT event_type) AS n_types,
                ${graft.Det.SUMD("value")} AS total_value
         FROM events GROUP BY 1 ORDER BY pseudo_id""",
    "q_pii_detect" ->
      s"""WITH p AS (SELECT c_mktsegment AS segment,
                           $ProfileSql AS profile
                    FROM customer),
         d AS (
           SELECT segment,
                  CAST(len(regexp_extract_all(profile, '$EmailRe'))
                       AS BIGINT) AS e,
                  CAST(len(regexp_extract_all(profile, '$PhoneRe'))
                       AS BIGINT) AS p,
                  CAST(len(regexp_extract_all(profile, '$CardRe'))
                       AS BIGINT) AS c,
                  CAST(length(profile) - length(
                    regexp_replace(regexp_replace(regexp_replace(profile,
                      '$CardRe', '<PAN>', 'g'),
                      '$EmailRe', '<EMAIL>', 'g'),
                      '$PhoneRe', '<PHONE>', 'g')) AS BIGINT) AS cut
           FROM p)
         SELECT segment, count(*) AS n_rows,
                CAST(sum(e) AS BIGINT) AS n_email,
                CAST(sum(p) AS BIGINT) AS n_phone,
                CAST(sum(c) AS BIGINT) AS n_card,
                CAST(sum(CASE WHEN e + p + c = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clean,
                ${graft.Det.ROUND6(
        "CAST(count(*) - sum(CASE WHEN e + p + c = 0 THEN 1 ELSE 0 END)" +
          " AS DOUBLE) / count(*)")} AS pii_rate,
                CAST(sum(cut) AS BIGINT) AS masked_chars
         FROM d GROUP BY segment ORDER BY segment""")
}

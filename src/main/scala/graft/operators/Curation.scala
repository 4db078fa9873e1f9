package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (north-star "operations a large-scale
  * training-data pipeline would need"): deterministic sampling, train/val
  * splitting, source re-weighting (upsampling), and sequence packing.
  * Everything keys off content-stable md5-derived integers — never
  * `rand()` — so runs are reproducible, resumable, and oracle-checkable;
  * at 100 TB that determinism is what makes a re-run of one failed
  * partition produce the same sample.
  */
object Curation extends QueryModule {

  /** Stable per-document bucket in [0,100) from the md5 of the doc text
    * (content-addressed: resilient to id reassignment across snapshots). */
  private def pctBucket = expr(
    "CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT) % 100")

  /** q_sample_hash — deterministic ~10% sample: bucket < 10. A seeded
    * Bernoulli (`sample()`) is engine-private; hash-bucketing gives the
    * same sample on every engine and every rerun. */
  private def qSampleHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("bucket", pctBucket)
      .filter($"bucket" < 10)
      .select($"doc_id", $"lang", $"bucket")
      .orderBy($"doc_id")
  }

  /** q_sample_stratified — per-source QUOTA sampling (round 2): keep the
    * 40 "first" documents of each source in content-hash order — the
    * stratified downsampling a curation pipeline uses to cap dominant
    * sources without touching rare ones. Hash order (not doc_id order)
    * makes the quota content-stable under id reassignment; the rank is a
    * per-source window, so the shuffle is one partition per source and
    * the quota cut happens before anything wide flows downstream
    * (WindowGroupLimit pushes the rank filter below the sort at scale).
    * The hash key is md5(coalesce(text, '')): a NULL text would otherwise
    * sort NULLS FIRST in Spark but NULLS LAST in DuckDB, silently changing
    * which rows make the quota. */
  private def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source")
      .orderBy(md5(coalesce($"text", lit(""))), $"doc_id")
    Tables.load(s, dir, "documents")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 40)
      .select($"doc_id", $"source", $"rk")
      .orderBy($"doc_id")
  }

  /** q_split_assign — 90/5/5 train/val/test split from the same stable
    * bucket; a document never migrates between splits across runs. */
  private def qSplitAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("bucket", pctBucket)
      .select($"doc_id",
        when($"bucket" < 90, "train")
          .when($"bucket" < 95, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  /** q_mix_weighted — source re-weighting (upsampling): English documents
    * ×2, everything else ×1 — the mixture-weights op of a pretraining
    * data recipe, as a generator (no shuffle until downstream). */
  private def qMixWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("weight", when($"lang" === "en", 2L).otherwise(1L))
      .withColumn("copy", explode(sequence(lit(1L), $"weight")))
      .select($"doc_id", $"lang", $"copy")
      .orderBy($"doc_id", $"copy")
  }

  /** q_pack_bins — sequence packing: assign documents to fixed-budget
    * token bins (4096) per source, in doc_id order, by cumulative token
    * count. The window cumsum is the distributed formulation of the
    * greedy packer's running total; per-source partitions keep the
    * shuffle keyed and bounded. */
  private def qPackBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .withColumn("n_tokens", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("bin", floor(($"cum_tokens" - 1) / 4096L))
      .select($"source", $"doc_id", $"n_tokens", $"cum_tokens", $"bin")
      .orderBy($"source", $"doc_id")
  }

  /** q_sample_weighted — weighted sampling WITHOUT replacement via
    * priority sampling (Efraimidis & Spirakis 2006): each document draws
    * u ∈ (0,1] and gets key −ln(u)/w with w = n_chars; the k smallest
    * keys are EXACTLY a w-proportional sample without replacement — the
    * quality-weighted / length-weighted subset selection a curation
    * pipeline runs after scoring. `rand()` would be engine-private and
    * non-resumable; here u = (h+1)/2^52 with h the first 13 md5 hex
    * digits of the salted text — a dyadic rational both engines
    * represent exactly, so `ln` sees identical input bits, and the run
    * is reproducible per document (the repo-wide content-hash stance).
    * Keys are quantized to 1e-9 BIGINTs with a doc_id tie-break before
    * the cut, the [[graft.Det]] transcendental discipline.
    *
    * Scale: one scan → TakeOrderedAndProject (per-partition top-k heap,
    * driver merges k·partitions rows); no shuffle, no global sort. */
  private def qSampleWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = expr(
      "CAST(conv(substr(md5(concat(text, '|ws')), 1, 13), 16, 10) AS BIGINT)")
    Tables.load(s, dir, "documents")
      .filter($"n_chars" > 0L)
      .withColumn("u",
        (h + lit(1L)).cast("double") / lit(4503599627370496.0))
      .withColumn("pq",
        floor(-log($"u") / $"n_chars".cast("double") * lit(1000000000.0)
          + lit(0.5)).cast("long"))
      .select($"doc_id", $"n_chars".as("weight"),
        ($"pq".cast("double") / lit(1000000000.0)).as("priority"))
      .orderBy($"priority", $"doc_id")
      .limit(50)
  }

  /** q_sample_group_topk — the PER-STRATUM form of [[qSampleWeighted]]:
    * within every source, keep the 5 documents with the smallest
    * Efraimidis–Spirakis priority keys — i.e. a length-weighted sample
    * without replacement PER SOURCE (the "cap every stratum but sample
    * its best proportionally" recipe; [[qSampleStratified]] is the
    * unweighted hash-order cousin). Same exactly-representable md5
    * dyadic u, same 1e-9 key quantization.
    *
    * Scale: the rank filter sits under a per-source window, so Spark
    * plans WindowGroupLimit — each map partition pre-prunes to its local
    * top-5 BEFORE the source-keyed exchange; shuffle volume is
    * O(sources·k), not O(rows). */
  private def qSampleGroupTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = expr(
      "CAST(conv(substr(md5(concat(text, '|ws')), 1, 13), 16, 10) AS BIGINT)")
    val pq = floor(-log((h + lit(1L)).cast("double") /
      lit(4503599627370496.0)) / $"n_chars".cast("double")
      * lit(1000000000.0) + lit(0.5)).cast("long")
    val w = Window.partitionBy($"source").orderBy($"pq", $"doc_id")
    Tables.load(s, dir, "documents")
      .filter($"n_chars" > 0L)
      .withColumn("pq", pq)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .select($"source", $"rk", $"doc_id", $"n_chars".as("weight"),
        ($"pq".cast("double") / lit(1000000000.0)).as("priority"))
      .orderBy($"source", $"rk")
  }

  /** q_chunk_docs — overlapping context windows: 32-token chunks at
    * stride 24 (8-token overlap), the chunking step upstream of packing.
    * Pure generator + slice: one output row per (doc, window), no shuffle
    * until downstream. */
  private def qChunkDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .withColumn("start",
        explode(expr("sequence(1, greatest(size(toks), 1), 24)")))
      .select(
        $"doc_id",
        $"start".cast("long").as("chunk_start"),
        expr("array_join(slice(toks, start, 32), ' ')").as("chunk_text"),
        expr("CAST(size(slice(toks, start, 32)) AS BIGINT)").as("chunk_len"))
      .orderBy($"doc_id", $"chunk_start")
  }

  /** q_scrub_text — cleaning pass: digit runs collapsed to a placeholder
    * (the shape of PII/number scrubbing), whitespace normalized. */
  private def qScrubText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(
        $"event_id",
        regexp_replace($"props", "[0-9]+", "<num>").as("scrubbed"),
        expr("CAST(regexp_count(props, '[0-9]+') AS BIGINT)").as("n_scrubbed"))
      .orderBy($"event_id")
  }

  /** q_curation_pipeline — the FULL pretraining-curation pipeline as one
    * declared, oracle-checked query: model-based quality filter → exact
    * dedup → MinHash near-dup drop → exact-substring-run drop →
    * embedding-coherence (mislabel/OOD) cut → stable train/val/test
    * split, reported as per-split document counts plus id-set
    * invariants (min/max/sum over the surviving set, so ANY drift in
    * any stage's surviving SET fails the hash gate — not just count
    * drift). CurationPipelineSpec proves the stage-by-stage accounting;
    * this query proves the COMPOSITION end-to-end against DuckDB, each
    * stage replayed by its own already-proven oracle stitched in as a
    * CTE. The "switch your pipeline to this library" claim, under the
    * hash gate.
    *
    * Scale shape: every stage is one of the already-audited plans; the
    * composition adds only doc_id anti-joins (bare-id relations — the
    * drop sets shuffle ids, never payloads) and reuses the split
    * assignment's content hash. Nothing here re-scans text beyond what
    * the component stages already scan. */
  private def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kept = TextOps.queries("q_classifier_score")(s, dir)
      .filter($"keep").select($"doc_id")
    val canon = TextOps.queries("q_dedup_exact")(s, dir).select($"doc_id")
    val mhDrops = Similarity.queries("q_dedup_minhash_lsh")(s, dir)
      .select($"b".as("doc_id")).distinct()
    val ssDrops = Similarity.queries("q_substring_dedup")(s, dir)
      .select($"doc_b".as("doc_id")).distinct()
    val cohDrops = Similarity.queries("q_embed_coherence")(s, dir)
      .filter($"coherence" < 0.0).select($"vec_id".as("doc_id"))
    kept.join(canon, "doc_id")
      .join(mhDrops, Seq("doc_id"), "left_anti")
      .join(ssDrops, Seq("doc_id"), "left_anti")
      .join(cohDrops, Seq("doc_id"), "left_anti")
      .join(qSplitAssign(s, dir), "doc_id")
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"),
        sum($"doc_id").as("docset_sum"))
      .orderBy($"split")
  }

  /** q_temperature_mix — temperature-scaled language sampling weights
    * (Conneau et al. 2020, XLM-R; Arivazhagan et al. 2019): sample
    * language i with probability q_i ∝ p_i^α, α = 0.3 — the published
    * recipe that upsamples low-resource languages without letting the
    * head language drown them. Emits per language the observed share,
    * the temperature-scaled share, the implied up/downsampling factor,
    * and the per-million-document budget allocation.
    *
    * Determinism: p_i^α is ONE pow per language (G evaluations total),
    * quantized half-up to a 1e-6 BIGINT immediately — the same
    * single-transcendental-then-quantize discipline as every ln in the
    * repo; all shares and factors are then exact integer rationals,
    * round6'd at emission.
    *
    * Scale: one map-side-combined G-row aggregate; the normalization
    * constant rides a whole-relation window over G rows. Nothing else
    * touches the fact. */
  private def qTemperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.load(s, dir, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      // both whole-relation windows ride the per-language count
      // relation — bounded by the language vocabulary, never fact-sized
      .withColumn("n_total",
        sum($"n_docs").over(Window.partitionBy()))
      .withColumn("qpow", floor(
        pow($"n_docs".cast("double") / $"n_total".cast("double"),
          lit(0.3)) * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("z", sum($"qpow").over(Window.partitionBy()))
    counts
      .select($"lang", $"n_docs",
        graft.Det.round6($"n_docs".cast("double") / $"n_total")
          .as("p_share"),
        graft.Det.round6($"qpow".cast("double") / $"z").as("q_share"),
        graft.Det.round6(($"qpow".cast("double") * $"n_total")
          / ($"z".cast("double") * $"n_docs")).as("upsample"),
        expr("(1000000 * qpow) div z").as("docs_per_million"))
      .orderBy($"lang")
  }

  /** q_weak_supervision — programmatic labeling, Snorkel-style
    * (Ratner et al. 2017): four deterministic labeling functions vote
    * +1 (keep) / −1 (drop) / 0 (abstain) on every document — length,
    * stopword presence, digit density, token repetitiveness — and the
    * majority sign becomes the weak label (ties abstain to NULL). The
    * pattern that turns heuristics into training labels when human
    * annotation can't reach corpus scale; a real deployment swaps in
    * domain LFs and a learned label model, the vote plumbing is
    * identical.
    *
    * Determinism: every LF is integer/string arithmetic (the digit-
    * density cut compares 10·digits > 3·len — no division), so votes,
    * counts and the label are exact in both engines.
    *
    * Scale: ONE scan, zero shuffles — all four LFs and the vote run in
    * a single codegen'd projection; the only exchange is the output
    * sort. */
  private def qWeakSupervision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split(lower($"text"), " ")
    val lfLength = when($"n_chars" > 400, 1L)
      .when($"n_chars" < 50, -1L).otherwise(0L)
    val lfStopword = when(
      arrays_overlap(toks, array(lit("the"), lit("of"), lit("and"))),
      1L).otherwise(0L)
    val digits = length(regexp_replace($"text", "[^0-9]", ""))
    val lfDigit = when(digits * 10 > length($"text") * 3, -1L)
      .otherwise(0L)
    val lfRepeat = when(
      size(array_distinct(toks)) * 2 < size(toks), -1L).otherwise(0L)
    Tables.load(s, dir, "documents")
      .select($"doc_id", lfLength.as("lf_length"),
        lfStopword.as("lf_stopword"), lfDigit.as("lf_digit"),
        lfRepeat.as("lf_repeat"))
      .withColumn("n_votes",
        (abs($"lf_length") + abs($"lf_stopword") + abs($"lf_digit")
          + abs($"lf_repeat")).cast("long"))
      .withColumn("vote_sum",
        $"lf_length" + $"lf_stopword" + $"lf_digit" + $"lf_repeat")
      .select($"doc_id", $"lf_length", $"lf_stopword", $"lf_digit",
        $"lf_repeat", $"n_votes",
        when($"vote_sum" > 0, 1L).when($"vote_sum" < 0, -1L)
          .as("label"))
      .orderBy($"doc_id")
  }

  /** q_gdpr_delete — right-to-be-forgotten cascade audit: a deletion
    * list of data subjects (customers on a deterministic md5 bucket,
    * standing in for the request queue) propagates through every table
    * keyed by that subject — customer, orders (o_custkey), events
    * (user_id) — and the audit reports per entity how many rows the
    * erasure removes. The compliance pass every data platform runs
    * before a purge: prove the blast radius, then delete.
    *
    * Determinism: pure integer counts plus one round6'd fraction.
    *
    * Scale: the deletion list is request-queue-sized and BROADCASTS
    * into one left join per table (never a shuffle of the facts); each
    * audit row is a single map-side-combined aggregate, and the purge
    * itself (not materialized here) is the same join as an anti. */
  private def qGdprDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val del = Tables.load(s, dir, "customer")
      .filter(substring(md5($"c_custkey".cast("string")), 1, 1) === "0")
      .select($"c_custkey".as("k"), lit(1L).as("del"))
    def audit(df: DataFrame, key: String, name: String): DataFrame =
      df.select(col(key).cast("long").as("k"))
        .join(broadcast(del), Seq("k"), "left")
        .agg(count(lit(1)).as("n_before"),
          sum(coalesce($"del", lit(0L))).as("n_deleted"))
        .select(lit(name).as("entity"), $"n_before", $"n_deleted",
          ($"n_before" - $"n_deleted").as("n_after"),
          graft.Det.round6($"n_deleted".cast("double") / $"n_before")
            .as("purge_frac"))
    audit(Tables.load(s, dir, "customer"), "c_custkey", "customer")
      .unionByName(audit(Tables.load(s, dir, "orders"), "o_custkey",
        "orders"))
      .unionByName(audit(Tables.load(s, dir, "events"), "user_id",
        "events"))
      .orderBy($"entity")
  }

  val queries: Map[String, Q] = Map(
    "q_gdpr_delete" -> (qGdprDelete _),
    "q_weak_supervision" -> (qWeakSupervision _),
    "q_temperature_mix" -> (qTemperatureMix _),
    "q_curation_pipeline" -> (qCurationPipeline _),
    "q_chunk_docs" -> (qChunkDocs _),
    "q_scrub_text" -> (qScrubText _),
    "q_sample_hash" -> (qSampleHash _),
    "q_sample_weighted" -> (qSampleWeighted _),
    "q_sample_group_topk" -> (qSampleGroupTopk _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_split_assign" -> (qSplitAssign _),
    "q_mix_weighted" -> (qMixWeighted _),
    "q_pack_bins" -> (qPackBins _))

  private val BUCKET =
    """(CAST(list_reduce(
      |   list_prepend('0', string_split(substr(md5(text), 1, 15), '')),
      |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 +
      |     instr('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) % 100)"""
      .stripMargin

  /** 52-bit md5 fraction numerator of the salted text (DuckDB replay of
    * the Spark `conv(substr(md5(...), 1, 13), 16, 10)` idiom). */
  private val WS_HASH =
    """CAST(list_reduce(
      |   list_prepend('0', string_split(substr(md5(text || '|ws'), 1, 13), '')),
      |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 +
      |     instr('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT)"""
      .stripMargin

  /** q_curation_pipeline oracle: each stage's ALREADY-PROVEN oracle SQL
    * stitched in as a derived table (DuckDB scopes nested WITH clauses
    * locally, so the component CTE names can't collide). */
  private def curationPipelineSql: String =
    s"""WITH kept AS (
         SELECT doc_id FROM (${TextOps.oracles("q_classifier_score")})
         WHERE keep),
       canon AS (
         SELECT doc_id FROM (${TextOps.oracles("q_dedup_exact")})),
       mh AS (
         SELECT DISTINCT b AS doc_id
         FROM (${Similarity.oracles("q_dedup_minhash_lsh")})),
       ss AS (
         SELECT DISTINCT doc_b AS doc_id
         FROM (${Similarity.oracles("q_substring_dedup")})),
       coh AS (
         SELECT vec_id AS doc_id
         FROM (${Similarity.oracles("q_embed_coherence")})
         WHERE coherence < 0.0),
       sp AS (
         SELECT doc_id,
                CASE WHEN $BUCKET < 90 THEN 'train'
                     WHEN $BUCKET < 95 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents),
       surv AS (
         SELECT kept.doc_id FROM kept
         JOIN canon USING (doc_id)
         WHERE kept.doc_id NOT IN (SELECT doc_id FROM mh)
           AND kept.doc_id NOT IN (SELECT doc_id FROM ss)
           AND kept.doc_id NOT IN (SELECT doc_id FROM coh))
       SELECT sp.split, count(*) AS n_docs,
              min(surv.doc_id) AS min_doc, max(surv.doc_id) AS max_doc,
              CAST(sum(surv.doc_id) AS BIGINT) AS docset_sum
       FROM surv JOIN sp USING (doc_id)
       GROUP BY sp.split ORDER BY split"""

  val oracles: Map[String, String] = Map(
    "q_gdpr_delete" -> {
      // the deletion set derives from the CUSTOMER table and joins onto
      // each audited table — mirroring the Spark query's broadcast join,
      // so equivalence does NOT depend on the (currently true) FK
      // invariant that every o_custkey / user_id exists in customer: an
      // orphan key that happens to hash to '0' is correctly NOT deleted
      // in both engines
      def audit(table: String, key: String, name: String): String =
        s"""SELECT '$name' AS entity, count(*) AS n_before,
              CAST(sum(CASE WHEN del.k IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_deleted
            FROM $table LEFT JOIN del ON CAST($key AS BIGINT) = del.k"""
      s"""WITH del AS (
           SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
           WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0'),
         a AS (
           ${audit("customer", "c_custkey", "customer")}
           UNION ALL ${audit("orders", "o_custkey", "orders")}
           UNION ALL ${audit("events", "user_id", "events")})
         SELECT entity, n_before, n_deleted,
                n_before - n_deleted AS n_after,
                ${graft.Det.ROUND6(
        "CAST(n_deleted AS DOUBLE) / n_before")} AS purge_frac
         FROM a ORDER BY entity"""
    },
    "q_weak_supervision" ->
      """WITH lf AS (
           SELECT doc_id,
                  CASE WHEN n_chars > 400 THEN 1
                       WHEN n_chars < 50 THEN -1 ELSE 0 END lf_length,
                  CASE WHEN len(list_filter(
                         string_split(lower(text), ' '),
                         t -> t IN ('the', 'of', 'and'))) > 0
                       THEN 1 ELSE 0 END lf_stopword,
                  CASE WHEN length(regexp_replace(text, '[^0-9]', '',
                         'g')) * 10 > length(text) * 3
                       THEN -1 ELSE 0 END lf_digit,
                  CASE WHEN len(list_distinct(
                         string_split(lower(text), ' '))) * 2
                         < len(string_split(lower(text), ' '))
                       THEN -1 ELSE 0 END lf_repeat
           FROM documents)
         SELECT doc_id,
                CAST(lf_length AS BIGINT) AS lf_length,
                CAST(lf_stopword AS BIGINT) AS lf_stopword,
                CAST(lf_digit AS BIGINT) AS lf_digit,
                CAST(lf_repeat AS BIGINT) AS lf_repeat,
                CAST(abs(lf_length) + abs(lf_stopword) + abs(lf_digit)
                     + abs(lf_repeat) AS BIGINT) AS n_votes,
                CAST(CASE WHEN lf_length + lf_stopword + lf_digit
                               + lf_repeat > 0 THEN 1
                          WHEN lf_length + lf_stopword + lf_digit
                               + lf_repeat < 0 THEN -1
                     END AS BIGINT) AS label
         FROM lf ORDER BY doc_id""",
    "q_temperature_mix" ->
      s"""WITH c AS (
           SELECT lang, count(*) n_docs FROM documents GROUP BY lang),
         t AS (
           SELECT lang, n_docs, CAST(sum(n_docs) OVER () AS BIGINT)
                    n_total
           FROM c),
         q AS (
           SELECT lang, n_docs, n_total,
                  CAST(floor(pow(CAST(n_docs AS DOUBLE)
                        / CAST(n_total AS DOUBLE), 0.3)
                      * 1000000.0 + 0.5) AS BIGINT) qpow
           FROM t),
         z AS (SELECT *, CAST(sum(qpow) OVER () AS BIGINT) z FROM q)
         SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
                ${graft.Det.ROUND6(
        "CAST(n_docs AS DOUBLE) / n_total")} AS p_share,
                ${graft.Det.ROUND6(
        "CAST(qpow AS DOUBLE) / z")} AS q_share,
                ${graft.Det.ROUND6(
        "(CAST(qpow AS DOUBLE) * n_total) / (CAST(z AS DOUBLE) * n_docs)")}
                  AS upsample,
                (1000000 * qpow) // z AS docs_per_million
         FROM z ORDER BY lang""",
    "q_curation_pipeline" -> curationPipelineSql,
    "q_sample_group_topk" ->
      s"""WITH h AS (
           SELECT doc_id, source, n_chars, $WS_HASH AS hv
           FROM documents WHERE n_chars > 0),
         k AS (
           SELECT doc_id, source, n_chars,
                  CAST(floor(-ln((CAST(hv AS DOUBLE) + 1) / 4503599627370496.0)
                             / CAST(n_chars AS DOUBLE) * 1000000000.0 + 0.5)
                       AS BIGINT) AS pq
           FROM h),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY source
                            ORDER BY pq, doc_id) AS BIGINT) AS rk
           FROM k)
         SELECT source, rk, doc_id, n_chars AS weight,
                CAST(pq AS DOUBLE) / 1000000000.0 AS priority
         FROM r WHERE rk <= 5 ORDER BY source, rk""",
    "q_sample_weighted" ->
      s"""WITH h AS (
           SELECT doc_id, n_chars, $WS_HASH AS hv
           FROM documents WHERE n_chars > 0),
         k AS (
           SELECT doc_id, n_chars,
                  CAST(floor(-ln((CAST(hv AS DOUBLE) + 1) / 4503599627370496.0)
                             / CAST(n_chars AS DOUBLE) * 1000000000.0 + 0.5)
                       AS BIGINT) AS pq
           FROM h)
         SELECT doc_id, n_chars AS weight,
                CAST(pq AS DOUBLE) / 1000000000.0 AS priority
         FROM k ORDER BY priority, doc_id LIMIT 50""",
    "q_sample_stratified" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY md5(coalesce(text, '')), doc_id)
                    AS rk
           FROM documents)
         WHERE rk <= 40 ORDER BY doc_id""",
    "q_chunk_docs" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         st AS (
           SELECT doc_id, toks,
                  unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS s
           FROM t)
         SELECT doc_id,
                CAST(s AS BIGINT) AS chunk_start,
                array_to_string(toks[s:s+31], ' ') AS chunk_text,
                CAST(len(toks[s:s+31]) AS BIGINT) AS chunk_len
         FROM st ORDER BY doc_id, chunk_start""",
    "q_scrub_text" ->
      """SELECT event_id,
                regexp_replace(props, '[0-9]+', '<num>', 'g') AS scrubbed,
                CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
                  AS n_scrubbed
         FROM events ORDER BY event_id""",
    "q_sample_hash" ->
      s"""SELECT doc_id, lang, $BUCKET AS bucket
         FROM documents WHERE $BUCKET < 10 ORDER BY doc_id""",
    "q_split_assign" ->
      s"""SELECT doc_id,
                CASE WHEN $BUCKET < 90 THEN 'train'
                     WHEN $BUCKET < 95 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q_mix_weighted" ->
      """SELECT doc_id, lang, unnest(range(1, CASE WHEN lang = 'en' THEN 3 ELSE 2 END)) AS copy
         FROM documents ORDER BY doc_id, copy""",
    "q_pack_bins" ->
      """WITH t AS (
           SELECT source, doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT source, doc_id, n_tokens,
                  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_tokens
           FROM t)
         SELECT source, doc_id, n_tokens,
                CAST(cum_tokens AS BIGINT) AS cum_tokens,
                CAST(floor((cum_tokens - 1) / 4096) AS BIGINT) AS bin
         FROM c ORDER BY source, doc_id""")
}

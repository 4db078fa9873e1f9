package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's two actual entry points, end to end (SURVEY.md §3.2,
  * §3.3), over reference-shaped tables (FIXTURES.md bottom section):
  *
  *  - [[conclusionsSummaries]] ≡
  *    `generate_conclusions_summaries.py`: Document ⋈ Body filtered to
  *    SBI/SBSTA (`:38-49`), eager-loaded blocks assembled in order
  *    (`:52-66`), symbol-prefixed prompt (`:110`), batch LLM with
  *    structured output + cost (`:102-117`), keyed by symbol.
  *  - [[decisionsSummaries]] ≡ `generate_decisions_summaries.py`:
  *    Decision → ordered DecisionBlockMap bridge → Block (`:39-47`),
  *    same assembly grammar, BARE-TEXT prompt (the reference drops the
  *    symbol, SURVEY.md §2.13.3 — replicated faithfully).
  *
  * Divergence made deterministic (SURVEY.md §2.13.1): the reference's
  * `dict[symbol] = text` keeps the LAST row per duplicate symbol in
  * iteration order; here duplicate symbols resolve to the row with the
  * MAX parent id — same "last wins" intent, but order-independent.
  *
  * The whole reference pipeline — filter+join parents, fan out child
  * fetches, driver-side assembly, thread-pool LLM batch — collapses into
  * one Catalyst-planned DAG with a single shuffle for assembly and
  * executor-parallel inference (SURVEY.md §3.2 Spark trace).
  */
object ReferencePipeline extends graft.QueryModule {

  /** Expected input schemas (FIXTURES.md):
    *  doc(doc_id, symbol, body_symbol)
    *  block(block_id, doc_id, ord, numbering, para_text, table_caption, table_cells)
    *  decision(dec_id, symbol)
    *  decision_block_map(dec_id, block_id, ord)
    */
  /** Last-write-wins winners, computed BEFORE any text is assembled
    * (r10: dedup-before-assembly). The output of either pipeline is one
    * summary per symbol, keyed by the max-parent-id document — so the
    * losers' doc_texts are never observable and need never be built.
    * Winner = max doc_id per symbol among parents with ≥1 piece row
    * (the inner assembly join's eligibility, preserved exactly: a
    * blockless parent can't win). The eligibility probe consumes only
    * the parents' and `hasBlocks`' KEY columns (semi join — Catalyst
    * prunes every piece/text expression out of that subtree), and the
    * winner relation is output-sized (≤ |symbols|), sealed so its three
    * consumers don't recompute the probe. At 100 TB this is the
    * dominant saving: assembly + dedup previously shuffled every
    * document's full text to keep |symbols| of them; now only winners'
    * blocks reach the string stage.
    *
    * `hasBlocks`: one column `doc_id`, one row per (not necessarily
    * distinct) block-bearing parent id. */
  private def lwwWinners(parents: DataFrame, hasBlocks: DataFrame): DataFrame =
    graft.Exec.seal(
      parents.join(hasBlocks, Seq("doc_id"), "left_semi")
        .groupBy(col("symbol")).agg(max(col("doc_id")).as("doc_id")))

  /** Assemble ONLY the winners' texts and key them: winners is
    * output-sized, so it broadcasts into the piece source (Catalyst
    * pushes the semi join below the piece projection — the string
    * expressions never run for losers). */
  private def assembleWinners(winners: DataFrame, pieces: DataFrame): DataFrame =
    winners.join(
      Assembly.assemble(pieces.join(broadcast(winners.select(col("doc_id"))),
        Seq("doc_id"), "left_semi")),
      Seq("doc_id"), "inner")

  /** Conclusions pipeline: returns (symbol, summary), one row per symbol. */
  def conclusionsSummaries(spark: SparkSession, docs: DataFrame,
                           blocks: DataFrame, client: Llm.SummarizerClient,
                           bodies: Seq[String] = Seq("SBI", "SBSTA")): DataFrame = {
    val cost = spark.sparkContext.doubleAccumulator("llm_cost_conclusions")
    val parents = docs.filter(col("body_symbol").isin(bodies: _*))
      .select(col("doc_id"), col("symbol"))
    // last-write-wins per symbol, deterministically: keep max doc_id —
    // decided before assembly so losers' texts are never built
    val winners = lwwWinners(parents, blocks.select(col("doc_id")))
    val pieces = blocks
      .withColumn("piece", Assembly.piece(col("numbering"), col("para_text"),
        col("table_caption"), col("table_cells")))
      .select(col("doc_id"), col("ord"), col("piece"))
    val deduped = assembleWinners(winners, pieces)
      .select(col("doc_id").as("id"), col("symbol"), col("doc_text").as("text"))
    Llm.summarize(deduped, () => client, batchSize = 32, cost = cost,
        // `:110` prepends the symbol with a newline separator
        // (f"{symbol}\n{text}") — replicated byte-for-byte; the stub gets
        // the doc text out-of-band so no prompt re-parsing is needed.
        mkPrompt = (sym, txt) => s"$sym\n$txt")
      .select(col("symbol"), col("summary"))
      .orderBy(col("symbol"))
  }

  /** Decisions pipeline: bridge traversal, bare-text prompt (§2.13.3). */
  def decisionsSummaries(spark: SparkSession, decisions: DataFrame,
                         bridge: DataFrame, blocks: DataFrame,
                         client: Llm.SummarizerClient): DataFrame = {
    val cost = spark.sparkContext.doubleAccumulator("llm_cost_decisions")
    val parents = decisions.select(col("dec_id").as("doc_id"), col("symbol"))
    // eligibility: a decision has blocks iff some bridge row's block_id
    // exists in blocks — key-column semi joins only, no text touched
    val hasBlocks = bridge
      .join(blocks.select(col("block_id")), Seq("block_id"), "left_semi")
      .select(col("dec_id").as("doc_id"))
    val winners = lwwWinners(parents, hasBlocks)
    // bridge ord overrides block-table ord: decision block order is the
    // map's order (generate_decisions_summaries.py:47)
    val pieces = bridge.alias("m")
      .join(blocks.alias("b"), col("m.block_id") === col("b.block_id"))
      .withColumn("piece", Assembly.piece(col("b.numbering"), col("b.para_text"),
        col("b.table_caption"), col("b.table_cells")))
      .select(col("m.dec_id").as("doc_id"), col("m.ord").as("ord"), col("piece"))
    val deduped = assembleWinners(winners, pieces)
      .select(col("doc_id").as("id"), col("symbol"), col("doc_text").as("text"))
    Llm.summarize(deduped, () => client, batchSize = 32, cost = cost,
        mkPrompt = (_, txt) => txt) // the reference sends ONLY the text
      .select(col("symbol"), col("summary"))
      .orderBy(col("symbol"))
  }

  // ---- declared queries: both reference entry points, driver-oracled ----
  //
  // The driver testdata has no reference-shaped tables, so both queries
  // derive them deterministically from orders/lineitem (the
  // Assembly.blocksFromLineitem idiom): orders become parents — the
  // symbol keyed off o_custkey % 199 so duplicate symbols EXIST and the
  // last-write-wins dedup is actually exercised — and lineitem rows
  // become blocks. With the deterministic StubClient the full pipelines
  // (body filter / bridge traversal, assembly grammar, dedup, batch
  // summarize) are DuckDB-oracle-checkable end to end.

  /** doc(doc_id, symbol, body_symbol) from orders: body cycles through
    * four reference bodies, so the SBI/SBSTA filter keeps half. */
  private def docFromOrders(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(s, dir, "orders").select(
      col("o_orderkey").as("doc_id"),
      concat(lit("FCCC/SBI/"), (col("o_custkey") % 199).cast("string"))
        .as("symbol"),
      when(col("o_orderkey") % 4 === 0, "SBI")
        .when(col("o_orderkey") % 4 === 1, "SBSTA")
        .when(col("o_orderkey") % 4 === 2, "COP")
        .otherwise("CMA").as("body_symbol"))

  private def qReferenceConclusions(s: SparkSession, dir: String): DataFrame =
    conclusionsSummaries(s, docFromOrders(s, dir),
      Assembly.blocksFromLineitem(s, dir), new Llm.StubClient)

  // The bridge AND the blocks both derive from lineitem (an artifact of
  // the fixture derivation — real deployments feed [[decisionsSummaries]]
  // three distinct tables), so the shared 5-column projection goes
  // through [[graft.Exec.sizedHub]]: above the threshold it persists and
  // lineitem is read ONCE per run at any scale; at fixture scale the two
  // page-cached scans are cheaper than a fact-sized cache write. The
  // bridge⋈block equi-join — the reference's actual shape and what this
  // query exists to exercise — is unchanged on both routes.
  /** The shared lineitem projection both fixture derivations consume. */
  private[graft] def decisionsLineitemHub(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))

  /** Fixture derivation + pipeline over an already-routed lineitem hub
    * (test seam: ReferencePipelineSpec runs it over BOTH hub routes and
    * pins the persist-route plan to a single lineitem read). */
  private[graft] def referenceDecisionsFrom(s: SparkSession, dir: String,
                                            li: DataFrame): DataFrame = {
    // blocks keyed by their own id; l_linenumber ≤ 7, so *8 is injective
    val blocks = Assembly.blocksFrom(li)
      .withColumn("block_id", col("doc_id") * 8 + col("ord"))
      .drop("doc_id", "ord")
    // the bridge REVERSES the lineitem order (ord = 8 - linenumber), so
    // the bridge-ord-overrides-block-ord semantics are load-bearing
    val bridge = li.select(
      col("l_orderkey").as("dec_id"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("block_id"),
      (lit(8) - col("l_linenumber")).as("ord"))
    val decisions = graft.sources.Tables.load(s, dir, "orders").select(
      col("o_orderkey").as("dec_id"),
      concat((col("o_custkey") % 199).cast("string"), lit("/CP.26"))
        .as("symbol"))
    decisionsSummaries(s, decisions, bridge, blocks, new Llm.StubClient)
  }

  private def qReferenceDecisions(s: SparkSession, dir: String): DataFrame = {
    val (li, release) = graft.Exec.sizedHub(decisionsLineitemHub(s, dir),
      graft.sources.Tables.rowCount(s, dir, "lineitem"))
    try referenceDecisionsFrom(s, dir, li).transform(graft.Exec.seal)
    finally release()
  }

  val queries: Map[String, Q] = Map(
    "q_reference_conclusions" -> (qReferenceConclusions _),
    "q_reference_decisions" -> (qReferenceDecisions _))

  /** Shared oracle CTE: blocksFromLineitem + piece grammar (the
    * q_doc_assembly oracle's text, verbatim) with a block_id column. */
  private val blocksSql =
    """b AS (
         SELECT l_orderkey AS doc_id, l_linenumber AS ord,
                l_orderkey * 8 + l_linenumber AS block_id,
                CASE WHEN l_linenumber % 2 = 1
                     THEN CAST(l_linenumber AS VARCHAR) || '.' END AS numbering,
                CASE WHEN l_linenumber % 3 <> 0
                     THEN 'p ' || CAST(l_partkey AS VARCHAR) END AS para_text,
                CASE WHEN l_linenumber % 3 = 0 AND l_suppkey % 2 = 1
                     THEN 'cap ' || CAST(l_suppkey AS VARCHAR) END AS table_caption,
                CASE WHEN l_linenumber % 3 = 0
                     THEN 'c ' || CAST(l_quantity AS VARCHAR) END AS table_cells
         FROM lineitem)"""

  private def pieceSql(src: String): String =
    s"""CASE WHEN $src.para_text IS NOT NULL
             THEN coalesce(trim($src.numbering) || chr(9), '')
                  || trim($src.para_text) || chr(10)
             WHEN $src.table_cells IS NOT NULL
             THEN coalesce(trim($src.table_caption) || chr(10), '')
                  || $src.table_cells || chr(10)
             ELSE '' END"""

  /** The StubClient summary law over an assembled text column. */
  private def stubSql(col: String): String =
    s"""array_to_string(string_split($col, ' ')[1:8], ' ')
        || ' … (' || CAST(len(string_split($col, ' ')) AS VARCHAR)
        || ' tokens)'"""

  val oracles: Map[String, String] = Map(
    "q_reference_conclusions" ->
      s"""WITH $blocksSql,
           p AS (SELECT doc_id, ord, ${pieceSql("b")} AS piece FROM b),
           asm AS (SELECT doc_id,
                          string_agg(piece, '' ORDER BY ord, piece) AS doc_text
                   FROM p GROUP BY doc_id),
           doc AS (SELECT o_orderkey AS doc_id,
                          'FCCC/SBI/' || CAST(o_custkey % 199 AS VARCHAR) AS symbol
                   FROM orders WHERE o_orderkey % 4 IN (0, 1)),
           j AS (SELECT doc.symbol, doc.doc_id, asm.doc_text
                 FROM doc JOIN asm USING (doc_id)),
           dd AS (SELECT symbol, doc_text FROM (
                    SELECT symbol, doc_text, row_number() OVER (
                      PARTITION BY symbol ORDER BY doc_id DESC) AS rn FROM j)
                  WHERE rn = 1)
         SELECT symbol, ${stubSql("doc_text")} AS summary
         FROM dd ORDER BY symbol""",
    "q_reference_decisions" ->
      s"""WITH $blocksSql,
           m AS (SELECT l_orderkey AS dec_id,
                        l_orderkey * 8 + l_linenumber AS block_id,
                        8 - l_linenumber AS ord
                 FROM lineitem),
           p AS (SELECT m.dec_id AS doc_id, m.ord AS ord,
                        ${pieceSql("b")} AS piece
                 FROM m JOIN b USING (block_id)),
           asm AS (SELECT doc_id,
                          string_agg(piece, '' ORDER BY ord, piece) AS doc_text
                   FROM p GROUP BY doc_id),
           d AS (SELECT o_orderkey AS dec_id,
                        CAST(o_custkey % 199 AS VARCHAR) || '/CP.26' AS symbol
                 FROM orders),
           j AS (SELECT d.symbol, d.dec_id, asm.doc_text
                 FROM d JOIN asm ON asm.doc_id = d.dec_id),
           dd AS (SELECT symbol, doc_text FROM (
                    SELECT symbol, doc_text, row_number() OVER (
                      PARTITION BY symbol ORDER BY dec_id DESC) AS rn FROM j)
                  WHERE rn = 1)
         SELECT symbol, ${stubSql("doc_text")} AS summary
         FROM dd ORDER BY symbol""")
}

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
object ReferencePipeline {

  /** Expected input schemas (FIXTURES.md):
    *  doc(doc_id, symbol, body_symbol)
    *  block(block_id, doc_id, ord, numbering, para_text, table_caption, table_cells)
    *  decision(dec_id, symbol)
    *  decision_block_map(dec_id, block_id, ord)
    */
  private def assembleDocs(parents: DataFrame, blocks: DataFrame): DataFrame = {
    val pieces = blocks
      .withColumn("piece", Assembly.piece(col("numbering"), col("para_text"),
        col("table_caption"), col("table_cells")))
      .select(col("doc_id"), col("ord"), col("piece"))
    parents.join(Assembly.assemble(pieces), Seq("doc_id"), "inner")
  }

  /** Conclusions pipeline: returns (symbol, summary), one row per symbol. */
  def conclusionsSummaries(spark: SparkSession, docs: DataFrame,
                           blocks: DataFrame, client: Llm.SummarizerClient,
                           bodies: Seq[String] = Seq("SBI", "SBSTA")): DataFrame = {
    val cost = spark.sparkContext.doubleAccumulator("llm_cost_conclusions")
    val parents = docs.filter(col("body_symbol").isin(bodies: _*))
      .select(col("doc_id"), col("symbol"))
    val assembled = assembleDocs(parents, blocks)
    // last-write-wins per symbol, deterministically: keep max doc_id
    val w = Window.partitionBy(col("symbol")).orderBy(col("doc_id").desc)
    val deduped = assembled.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
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
    // bridge ord overrides block-table ord: decision block order is the
    // map's order (generate_decisions_summaries.py:47)
    val pieces = bridge.alias("m")
      .join(blocks.alias("b"), col("m.block_id") === col("b.block_id"))
      .withColumn("piece", Assembly.piece(col("b.numbering"), col("b.para_text"),
        col("b.table_caption"), col("b.table_cells")))
      .select(col("m.dec_id").as("doc_id"), col("m.ord").as("ord"), col("piece"))
    val assembled = decisions.select(col("dec_id").as("doc_id"), col("symbol"))
      .join(Assembly.assemble(pieces), Seq("doc_id"), "inner")
    val w = Window.partitionBy(col("symbol")).orderBy(col("doc_id").desc)
    val deduped = assembled.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id").as("id"), col("symbol"), col("doc_text").as("text"))
    Llm.summarize(deduped, () => client, batchSize = 32, cost = cost,
        mkPrompt = (_, txt) => txt) // the reference sends ONLY the text
      .select(col("symbol"), col("summary"))
      .orderBy(col("symbol"))
  }
}

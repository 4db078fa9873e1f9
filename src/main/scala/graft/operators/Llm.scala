package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.util.DoubleAccumulator

/** T5 — LLM batch summarization (SURVEY.md §2.9 T5): the reference's
  * pipeline at
  * `/root/reference/decisions-summaries/generate_conclusions_summaries.py:96-117`
  * — prompt-template each document, batch-call a chat model with
  * structured `{summary}` output, parse, and accumulate dollar cost
  * (`get_openai_callback()` → `cost += cb.total_cost`, `:113-117`).
  *
  * Spark design: the reference's LangChain `.batch()` thread pool becomes
  * `mapPartitions` — one client per PARTITION (not per row), prompts
  * micro-batched inside the partition, so at 100 TB the fan-out is
  * executor-parallel and the connection count is bounded by partition
  * count. The model response is parsed with `from_json` against the
  * declared response schema (the pydantic `ConclusionSummaryAgentResponse`
  * equivalent, `:99-100`); cost accrues in a `DoubleAccumulator` (A6).
  *
  * Offline stub: zero-egress environments get [[StubClient]], a
  * deterministic summarizer (first 8 tokens + token count) that exercises
  * the full plumbing — template, batching, JSON parse, accumulator — and,
  * being pure arithmetic on the text, is even DuckDB-oracle-checkable.
  * A real HTTP client implements the same [[SummarizerClient]] trait.
  */
object Llm extends QueryModule {

  /** Structured-output contract: `{"summary": str}`. */
  val responseSchema: StructType =
    StructType(Seq(StructField("summary", StringType)))

  /** Batch inference boundary — one instance per partition. `docs` carries
    * the raw document text out-of-band (parallel to `prompts`): a real
    * HTTP client reads only `prompts`; deterministic offline clients read
    * `docs` directly instead of re-parsing it out of an arbitrary prompt
    * template (doc text may itself contain any separator). */
  trait SummarizerClient extends Serializable {
    /** Raw JSON response per prompt, plus the batch's dollar cost. */
    def summarizeBatch(prompts: Seq[String], docs: Seq[String]): (Seq[String], Double)
  }

  /** Deterministic offline summarizer: first 8 whitespace tokens of the
    * out-of-band doc text + count; cost = $1e-6 per prompt character
    * (mirrors per-token pricing). */
  final class StubClient extends SummarizerClient {
    private def jsonEscape(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def summarizeBatch(prompts: Seq[String], docs: Seq[String]): (Seq[String], Double) = {
      val out = docs.map { doc =>
        val toks = doc.split(" ")
        val head = toks.take(8).mkString(" ")
        val summary = s"$head … (${toks.length} tokens)"
        s"""{"summary": "${jsonEscape(summary)}"}"""
      }
      (out, prompts.map(_.length * 1e-6).sum)
    }
  }

  /** The reference's prompt template (`ChatPromptTemplate`, `:103-105`),
    * with the symbol passed explicitly (SURVEY.md §2.13.3). */
  def prompt(symbol: String, text: String): String =
    s"Summarize UNFCCC document $symbol in one sentence: $text"

  /** Distributed batch summarization: (id, symbol, text) → (id, summary);
    * `batchSize` bounds each remote call, `cost` accrues per batch.
    * `mkPrompt` lets callers replicate either reference template —
    * conclusions (symbol-prefixed) or decisions (bare text).
    *
    * Cost caveat: accumulator updates inside a transformation can
    * double-count on task retries (Spark guarantees exactly-once only in
    * actions). The reference's callback-based cost tracking has the same
    * best-effort character; treat `cost` as an operational metric, not an
    * invoice. */
  def summarize(docs: DataFrame, clientFactory: () => SummarizerClient,
                batchSize: Int, cost: DoubleAccumulator,
                mkPrompt: (String, String) => String = prompt): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val raw = docs.select(col("id"), col("symbol"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        // ONE client per partition, constructed executor-side — the
        // connection-pool shape a real HTTP client needs (never a
        // driver-serialized instance shared across tasks)
        val client = clientFactory()
        it.grouped(batchSize).flatMap { batch =>
          val prompts = batch.map { case (_, sym, txt) => mkPrompt(sym, txt) }
          val docTexts = batch.map { case (_, _, txt) => txt }
          val (responses, batchCost) = client.summarizeBatch(prompts, docTexts)
          cost.add(batchCost)
          batch.zip(responses).map { case ((id, sym, _), r) => (id, sym, r) }
        }
      }
      .toDF("id", "symbol", "raw")
    raw.withColumn("parsed", from_json(col("raw"), responseSchema))
      .select(col("id"), col("symbol"), col("parsed.summary").as("summary"))
  }

  /** q_llm_summarize — stub-backed end-to-end run over `documents`
    * (symbol = "DOC/<id>"): deterministic, so oracle-checked. */
  private def qLlmSummarize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val acc = s.sparkContext.doubleAccumulator("llm_cost")
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id".as("id"),
        concat(lit("DOC/"), $"doc_id".cast("string")).as("symbol"), $"text")
    summarize(docs, () => new StubClient, batchSize = 32, cost = acc)
      .orderBy($"id")
  }

  val queries: Map[String, Q] = Map("q_llm_summarize" -> (qLlmSummarize _))

  val oracles: Map[String, String] = Map(
    "q_llm_summarize" ->
      """SELECT doc_id AS id,
                'DOC/' || CAST(doc_id AS VARCHAR) AS symbol,
                array_to_string(string_split(text, ' ')[1:8], ' ')
                  || ' … (' || CAST(len(string_split(text, ' ')) AS VARCHAR)
                  || ' tokens)' AS summary
         FROM documents ORDER BY id""")
}

package graft.operators

import graft.QueryModule
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference's flagship computation (SURVEY.md §2.4 A3, §7.2):
  * per-parent ORDERED concatenation of block texts — the Python loop at
  * `/root/reference/decisions-summaries/generate_conclusions_summaries.py:52-66`
  * /`generate_decisions_summaries.py:45-59` walking
  * `DocumentCore.blocks` (resp. the `DecisionBlockMap` bridge), branching on
  * the paragraph/table tagged union, and building one text per document.
  *
  * Concat grammar (SURVEY.md §2.13.4), per block in `ord` order:
  *   paragraph block: `numbering? "\t"` + `para_text` + `"\n"`
  *   table block:     `caption? "\n"` + `cells_text` + `"\n"`
  *   neither:         contributes nothing
  * Numbering, paragraph text and caption are trimmed per the reference's
  * `.strip()` calls before the separators are appended; `cells_text` is
  * NOT — the reference appends it raw
  * (`generate_conclusions_summaries.py:64`), so neither do we.
  *
  * Spark design: the reference's `selectinload` fan-out + driver-side loop
  * collapses into one distributed plan — derive block rows, compute each
  * block's `piece` with a codegen'd `when` chain (no UDF), then ONE shuffle:
  * `groupBy(doc).agg(collect_list(struct(ord, piece)))` with an explicit
  * `array_sort` (a DataFrame has no implicit row order — SURVEY.md §1.2
  * `[inferred]` block ordering becomes the explicit `ord` column).
  * Per-group state is bounded by blocks-per-document, the same boundedness
  * the reference assumes holding one document's text in memory — at 100 TB
  * this scales with document count, not corpus size.
  */
object Assembly extends QueryModule {

  /** Piece grammar as a Column expression over the block tagged union. */
  def piece(numbering: Column, paraText: Column, tableCaption: Column,
            tableCells: Column): Column =
    when(paraText.isNotNull,
      concat(
        coalesce(concat(trim(numbering), lit("\t")), lit("")),
        trim(paraText), lit("\n")))
    .when(tableCells.isNotNull,
      concat(
        coalesce(concat(trim(tableCaption), lit("\n")), lit("")),
        tableCells, lit("\n")))
    .otherwise(lit(""))

  /** Assemble one text per document from (doc_id, ord, piece) rows. */
  def assemble(blocks: DataFrame): DataFrame = {
    val s = blocks.sparkSession
    import s.implicits._
    blocks
      .groupBy($"doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct($"ord", $"piece"))),
          x => x.getField("piece")),
        "").as("doc_text"))
  }

  /** One (ord, piece) block row for the typed aggregation path. */
  case class BlockPiece(ord: Int, piece: String)

  /** Typed `Aggregator` variant of [[assemble]] (SURVEY.md §2.11 UDAF
    * surface): demonstrates partial/final merge semantics explicitly —
    * the buffer accumulates (ord, piece) pairs, `merge` concatenates
    * partial buffers from different partitions, and `finish` sorts once by
    * (ord, piece) and concatenates. Semantically identical to the
    * `collect_list`+`array_sort` Column formulation (same tie-break), and
    * like it, buffer size is bounded by blocks-per-document. */
  object AssembleAgg extends Aggregator[BlockPiece, List[BlockPiece], String] {
    override def zero: List[BlockPiece] = Nil
    override def reduce(b: List[BlockPiece], a: BlockPiece): List[BlockPiece] =
      a :: b
    override def merge(x: List[BlockPiece], y: List[BlockPiece]): List[BlockPiece] =
      x ::: y
    override def finish(b: List[BlockPiece]): String =
      b.sortBy(p => (p.ord, p.piece)).iterator.map(_.piece).mkString
    override def bufferEncoder: Encoder[List[BlockPiece]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[BlockPiece]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Typed assembly: Dataset API end of the same computation. */
  def assembleTyped(blocks: DataFrame): DataFrame = {
    val s = blocks.sparkSession
    import s.implicits._
    blocks.select($"doc_id", $"ord", $"piece")
      .as[(Long, Int, String)]
      .groupByKey(_._1)
      .mapValues(r => BlockPiece(r._2, r._3))
      .agg(AssembleAgg.toColumn.name("doc_text"))
      .toDF("doc_id", "doc_text")
  }

  /** Deterministic block table derived from `lineitem` (the driver testdata
    * has no block table; the derivation exercises the full null lattice:
    * odd line numbers carry numbering, every 3rd line is a table block,
    * half the table blocks have no caption). */
  def blocksFromLineitem(s: SparkSession, dir: String): DataFrame =
    blocksFrom(graft.sources.Tables.load(s, dir, "lineitem"))

  /** Same block derivation over an ALREADY-LOADED lineitem projection —
    * the seam that lets q_reference_decisions share one lineitem scan
    * between its block and bridge derivations ([[graft.Exec.sizedHub]]). */
  def blocksFrom(li: DataFrame): DataFrame =
    li.select(
      col("l_orderkey").as("doc_id"),
      col("l_linenumber").as("ord"),
      when(col("l_linenumber") % 2 === 1,
        concat(col("l_linenumber").cast("string"), lit("."))).as("numbering"),
      when(col("l_linenumber") % 3 =!= 0,
        concat(lit("p "), col("l_partkey").cast("string"))).as("para_text"),
      when(col("l_linenumber") % 3 === 0 && col("l_suppkey") % 2 === 1,
        concat(lit("cap "), col("l_suppkey").cast("string"))).as("table_caption"),
      when(col("l_linenumber") % 3 === 0,
        concat(lit("c "), col("l_quantity").cast("string"))).as("table_cells"))

  /** A3 q_doc_assembly — the end-to-end flagship slice (SURVEY.md §7.2). */
  def qDocAssembly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = blocksFromLineitem(s, dir)
    assemble(b.withColumn("piece",
        piece($"numbering", $"para_text", $"table_caption", $"table_cells"))
      .select($"doc_id", $"ord", $"piece"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map("q_doc_assembly" -> (qDocAssembly _))

  val oracles: Map[String, String] = Map(
    "q_doc_assembly" ->
      """WITH b AS (
           SELECT l_orderkey AS doc_id, l_linenumber AS ord,
                  CASE WHEN l_linenumber % 2 = 1
                       THEN CAST(l_linenumber AS VARCHAR) || '.' END AS numbering,
                  CASE WHEN l_linenumber % 3 <> 0
                       THEN 'p ' || CAST(l_partkey AS VARCHAR) END AS para_text,
                  CASE WHEN l_linenumber % 3 = 0 AND l_suppkey % 2 = 1
                       THEN 'cap ' || CAST(l_suppkey AS VARCHAR) END AS table_caption,
                  CASE WHEN l_linenumber % 3 = 0
                       THEN 'c ' || CAST(l_quantity AS VARCHAR) END AS table_cells
           FROM lineitem),
         p AS (
           SELECT doc_id, ord,
                  CASE WHEN para_text IS NOT NULL
                       THEN coalesce(trim(numbering) || chr(9), '')
                            || trim(para_text) || chr(10)
                       WHEN table_cells IS NOT NULL
                       THEN coalesce(trim(table_caption) || chr(10), '')
                            || table_cells || chr(10)
                       ELSE '' END AS piece
           FROM b)
         SELECT doc_id, string_agg(piece, '' ORDER BY ord, piece) AS doc_text
         FROM p GROUP BY doc_id ORDER BY doc_id""")
}

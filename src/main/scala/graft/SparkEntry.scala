package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator module's declared queries and DuckDB oracles. */
object SparkEntry {

  private[graft] def modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Assembly,
    operators.Windows,
    operators.AsOf,
    operators.SemiStructured,
    operators.TextOps,
    operators.Similarity,
    operators.Graphs,
    operators.Analytics,
    operators.MlOps,
    operators.Llm,
    operators.ReferencePipeline,
    operators.Multimodal,
    operators.Curation,
    operators.Governance,
    operators.Layouts,
    streaming.StreamOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_doc_assembly exercises scan, join-shaped derivation, null
    * branching, ordered aggregation, and sort in one plan (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    operators.Assembly.qDocAssembly(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

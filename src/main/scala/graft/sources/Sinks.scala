package graft.sources

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2.1 S4–S6): the reference materializes results as
  * UTF-8 CSV (`df.to_csv("decision_summaries.csv", encoding="utf-8")`,
  * `/root/reference/decisions-summaries/generate_decisions_summaries.py:119-120`)
  * and prints progress to stdout. Here: header CSV and Parquet writers.
  *
  * Scale: `coalesce(1)` exists only for small result sets a human opens
  * (the reference's use case); large outputs keep their partitioning and
  * write one file per task. */
object Sinks {

  /** S4 — CSV sink (header, UTF-8; Spark writes UTF-8 natively). The
    * pandas leading index column is NOT replicated (SURVEY.md §2.1 S4). */
  def writeCsv(df: DataFrame, path: String, single: Boolean = true): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S6 — Parquet sink (the verification-dump format). */
  def writeParquet(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode("overwrite").parquet(path)

  /** S5 — stdout progress sink (`print(f"{decision.symbol} [{id}]")`,
    * `generate_decisions_summaries.py:46`): driver-side peek of the first
    * rows, never a full collect. */
  def progress(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  /** S4b — JSON-Lines sink: one JSON object per line, the interchange
    * format training-data pipelines exchange corpora in. Unlike CSV,
    * JSON string escaping is fully specified, so free-text columns
    * round-trip losslessly (q_jsonl_roundtrip proves it by checksum). */
  def writeJsonl(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode("overwrite").json(path)

  /** S4c — ORC sink: the other columnar container a lakehouse ingests
    * from (Hive/Trino estates ship ORC the way Spark estates ship
    * Parquet). Same predicate-pushdown/column-pruning story as Parquet;
    * q_orc_roundtrip proves the round trip lossless by checksum. */
  def writeOrc(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode("overwrite").orc(path)

  /** Scale path: hive-style partitioned Parquet layout. Readers filtering
    * on the partition columns prune whole directories before any IO —
    * the layout a 100 TB events table must have (static + dynamic
    * partition pruning both key off it). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}

package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, col}

/** CHANGE DATA FEED over a DirSink zone (round-13 verdict task 5):
  * downstream incremental consumers (dedup history, index maintenance,
  * derived tables) read exactly the ROW-LEVEL changes between two
  * generations instead of re-scanning the zone after every DELETE/
  * UPDATE/MERGE —
  *
  * {{{
  * ChangeFeed.read(spark, zone, startingVersion = 3)
  * // zone columns + _change_type ('insert' | 'delete')
  * //              + _commit_version (the generation that changed it)
  * }}}
  *
  * Derivation (no CDC sidecar files — the commit log alone carries it):
  * each generation's segment records which committed files arrived and
  * which left ([[DirSinkLog.changesBetween]]).
  *
  *   - An append generation's added files are pure inserts — read
  *     directly, no diff.
  *   - A rewrite generation (DELETE/UPDATE/MERGE/compact/overwrite)
  *     yields `old exceptAll new` as deletes and `new exceptAll old`
  *     as inserts, where old = the REMOVED files read at gen-1 and new
  *     = the ADDED files read at gen (both via generation time travel
  *     + the `files` scan restriction, so I/O is bounded by the
  *     rewrite's touched files, never the zone). The multiset
  *     exceptAll CANCELS carried-over rows, so an UPDATE surfaces as
  *     exactly one delete+insert pair per modified row and the
  *     unmodified rows of rewritten files never appear — "exactly the
  *     changed rows", which is what makes an incremental consumer's
  *     work proportional to the change, not the rewrite. A compaction
  *     (row-preserving by construction) therefore yields an EMPTY
  *     change set — the correct answer, at the cost of one diff over
  *     the compacted files.
  *
  * Retention: the feed reads history, so it reaches only as far back
  * as vacuum has retained segments (startingVersion older than the
  * oldest retained base fails loudly, never silently truncates).
  * Schema changes inside the range are refused — a feed row needs one
  * schema; restart the consumer from the evolve generation (the Delta
  * CDF discipline).
  *
  * Streaming consumption is the same API driven by the zone's own
  * offsets: track the last consumed generation (e.g. in the consumer's
  * state store) and read `(last, head]` per tick —
  * [[graft.streaming.StreamRun]] scenario J drives an incremental
  * dedup that way.
  */
object ChangeFeed {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** Wall-clock commit stamp of the generation that changed the row —
    * the segment's `t=` header surfaced as a column (Delta CDF parity:
    * `_commit_timestamp`). Constant per generation; NULL only for
    * segments written before stamps existed. */
  val CommitTsCol = "_commit_timestamp"

  /** The feed in [startingVersion, endingVersion] (inclusive both ends,
    * Delta's vocabulary); endingVersion defaults to the zone's head. */
  def read(spark: SparkSession, path: String, startingVersion: Long,
           endingVersion: Option[Long] = None): DataFrame = {
    val fmt = classOf[DirSinkSource].getName
    val head = DirSink.currentGen(path).getOrElse(
      throw new IllegalArgumentException(
        s"no committed zone under $path"))
    val end = endingVersion.getOrElse(head)
    val changes = DirSinkLog.changesBetween(path, startingVersion - 1, end)
    // a RENAME inside the range is positionally harmless (the feed
    // emits under the head's names); only an arity/type change makes
    // the rows incomparable and refuses
    val shapes = changes.map(_.schemaDdl).distinct.map(d =>
      org.apache.spark.sql.types.StructType.fromDDL(d)
        .fields.map(_.dataType).toSeq).distinct
    if (shapes.size > 1) throw new UnsupportedOperationException(
      s"zone $path changed schema inside the requested feed range " +
        s"[$startingVersion, $end] — read up to the evolve generation, " +
        "then restart the consumer from it")
    val schema = DirSink.readManifestSchema(path)

    def readFiles(gen: Long, files: Seq[String]): DataFrame =
      spark.read.format(fmt).option("path", path)
        .option("asOfVersion", gen)
        .option("files", files.mkString(","))
        // a feed row speaks ONE schema across the range: decode era
        // files through the HEAD schema (era-schema travel would hand
        // back era arities, which can be narrower than the head's)
        .option(DirSinkSource.EraSchemaKey, "false")
        .load()
        // normalize era names to the HEAD's (positional — a rename
        // never reorders)
        .toDF(schema.fieldNames.toSeq: _*)

    def tagged(df: DataFrame, tpe: String, gen: Long,
               ts: Option[Long]): DataFrame =
      df.withColumn(ChangeTypeCol, lit(tpe))
        .withColumn(CommitVersionCol, lit(gen))
        .withColumn(CommitTsCol, ts.fold(
          lit(null).cast(org.apache.spark.sql.types.TimestampType))(m =>
          org.apache.spark.sql.functions.timestamp_millis(lit(m))))

    val parts = changes.flatMap { c =>
      (c.addNames, c.removeNames) match {
        case (Nil, Nil) => Nil // metadata-only commit (evolve/checks)
        case (adds, Nil) =>
          Seq(tagged(readFiles(c.gen, adds), "insert", c.gen, c.ts))
        case (adds, removes) =>
          val oldRows = readFiles(c.gen - 1, removes)
          val newRows =
            if (adds.isEmpty) spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              oldRows.schema)
            else readFiles(c.gen, adds)
          Seq(tagged(newRows.exceptAll(oldRows), "insert", c.gen, c.ts),
            tagged(oldRows.exceptAll(newRows), "delete", c.gen, c.ts))
      }
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(ChangeTypeCol,
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField(CommitVersionCol,
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(CommitTsCol,
          org.apache.spark.sql.types.TimestampType, nullable = true))))
    parts.foldLeft(empty)(_ unionAll _)
      .select(schema.fieldNames.map(col).toSeq :+
        col(ChangeTypeCol) :+ col(CommitVersionCol) :+ col(CommitTsCol): _*)
  }
}

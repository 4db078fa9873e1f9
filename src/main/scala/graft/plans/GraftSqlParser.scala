package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.Row

/** MAINTENANCE SQL for the table format — the `OPTIMIZE` / `VACUUM`
  * statements every governed format grows (Delta's surface), injected
  * through `SparkSessionExtensions.injectParser` so they work in any
  * session carrying `spark.sql.extensions=graft.GraftExtensions`:
  *
  * {{{
  * OPTIMIZE cat.db.t                          -- compact to one file per core
  * OPTIMIZE cat.db.t CLUSTER BY (ts) TARGET 8 FILES
  * VACUUM cat.db.t RETAIN 168 HOURS           -- sweep unreferenced orphans
  * VACUUM cat.db.t RETAIN 0 HOURS DRY RUN     -- list, don't delete
  * }}}
  *
  * Both resolve the table through the session's catalog manager and
  * require a [[graft.sources.v2.DirSinkTable]] (the statements are
  * format maintenance — they have no meaning on foreign tables, so a
  * non-graft name is a loud error, not a no-op). Everything that is
  * not one of these two statements delegates verbatim to Spark's
  * parser — zero behavior change for the rest of SQL. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+([\w.`$]+)\s*(?:(CLUSTER|ZORDER)\s+BY\s*\(([^)]*)\)\s*)?(?:TARGET\s+(\d+)\s+FILES\s*)?(?:SMALLER\s+THAN\s+(\d+)\s*(B|KB|MB|GB)?\s*)?;?\s*$""".r
  private val Vacuum =
    """(?is)^\s*VACUUM\s+([\w.`$]+)\s*(?:RETAIN\s+(\d+)\s+HOURS\s*)?(DRY\s+RUN\s*)?;?\s*$""".r
  private val Restore =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?([\w.`$]+)\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+(?:'([^']+)'|(\d+)))\s*;?\s*$""".r
  private val Clone =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.`$]+)\s+SHALLOW\s+CLONE\s+([\w.`$]+)\s*;?\s*$""".r
  private val Reorg =
    """(?is)^\s*REORG\s+(?:TABLE\s+)?([\w.`$]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Reorg(name) =>
      ReorgZoneCommand(delegate.parseMultipartIdentifier(name))
    case Clone(dst, src) =>
      CloneZoneCommand(delegate.parseMultipartIdentifier(dst),
        delegate.parseMultipartIdentifier(src))
    case Restore(name, ver, tsStr, tsMs) =>
      RestoreZoneCommand(delegate.parseMultipartIdentifier(name),
        Option(ver).map(_.toLong),
        Option(tsStr).map(s => java.sql.Timestamp.valueOf(s).getTime)
          .orElse(Option(tsMs).map(_.toLong)))
    case Optimize(name, kind, cols, target, small, unit) =>
      val colList = Option(cols).toSeq.flatMap(_.split(",").toSeq)
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      val zorder = Option(kind).exists(_.equalsIgnoreCase("ZORDER"))
      val smallerThan = Option(small).map { n =>
        n.toLong * (Option(unit).map(_.toUpperCase) match {
          case Some("KB") => 1L << 10
          case Some("MB") => 1L << 20
          case Some("GB") => 1L << 30
          case _ => 1L
        })
      }
      if (smallerThan.isDefined && target != null)
        throw new IllegalArgumentException(
          "OPTIMIZE … SMALLER THAN is incremental bin-packing: output " +
            "sizing derives from the threshold, so it composes with " +
            "CLUSTER BY and ZORDER BY but not TARGET (a whole-zone " +
            "rewrite knob)")
      OptimizeZoneCommand(delegate.parseMultipartIdentifier(name),
        if (zorder) Nil else colList,
        Option(target).map(_.toInt),
        if (zorder) colList else Nil,
        smallerThan)
    case Vacuum(name, hours, dry) =>
      VacuumZoneCommand(delegate.parseMultipartIdentifier(name),
        Option(hours).map(_.toLong).getOrElse(168L),
        dryRun = dry != null)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private[plans] object ZoneResolve {
  /** Resolve a multipart name through the session catalog manager to
    * the DirSink zone path behind it. */
  def zonePath(spark: SparkSession, name: Seq[String]): String = {
    val cm = spark.sessionState.catalogManager
    val (catalog, ident) = name match {
      case Seq(one) =>
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, one))
      case head +: rest if cm.isCatalogRegistered(head) =>
        (cm.catalog(head), Identifier.of(rest.init.toArray, rest.last))
      case _ =>
        (cm.currentCatalog, Identifier.of(name.init.toArray, name.last))
    }
    catalog match {
      case tc: TableCatalog => tc.loadTable(ident) match {
        case t: graft.sources.v2.DirSinkTable => t.zonePath
        case other => throw new IllegalArgumentException(
          s"${name.mkString(".")} is not a graft zone " +
            s"(${other.getClass.getSimpleName}) — OPTIMIZE/VACUUM are " +
            "table-format maintenance statements")
      }
      case c => throw new IllegalArgumentException(
        s"catalog ${c.name()} is not a table catalog")
    }
  }

  /** The zone directory a NOT-YET-EXISTING table name would occupy —
    * the CLONE target's allocation, same layout rule as CREATE TABLE.
    * Requires a [[graft.sources.v2.GraftCatalog]] (only it has the
    * `<warehouse>/<ns…>/<table>` path convention). */
  def newZonePath(spark: SparkSession, name: Seq[String]): String = {
    val cm = spark.sessionState.catalogManager
    val (catalog, ident) = name match {
      case Seq(one) =>
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, one))
      case head +: rest if cm.isCatalogRegistered(head) =>
        (cm.catalog(head), Identifier.of(rest.init.toArray, rest.last))
      case _ =>
        (cm.currentCatalog, Identifier.of(name.init.toArray, name.last))
    }
    catalog match {
      case gc: graft.sources.v2.GraftCatalog => gc.pathFor(ident)
      case c => throw new IllegalArgumentException(
        s"catalog ${c.name()} is not a graft catalog — SHALLOW CLONE " +
          "targets allocate their zone through the graft layout rule")
    }
  }
}

/** `OPTIMIZE` — [[graft.sources.v2.DirSink.compact]] as SQL: rewrite
  * the zone's committed files into `targetFiles` larger ones (default
  * one per session core), range-clustered + sorted on `clusterBy` —
  * or, with `ZORDER BY (a, b[, c])`, clustered on the Morton
  * interleave of the dims so every output file covers a tight
  * hyper-rectangle and per-file stats skip on predicates over ANY of
  * the dimensions (Delta's OPTIMIZE ZORDER). Returns (files_before,
  * files_after, rows). */
case class OptimizeZoneCommand(name: Seq[String], clusterBy: Seq[String],
                               targetFiles: Option[Int],
                               zorderBy: Seq[String] = Nil,
                               smallerThan: Option[Long] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = ZoneResolve.zonePath(spark, name)
    def zoneState: (Long, Long) =
      graft.sources.v2.DirSink.readManifestEntries(path)
        .map { case (_, es) => (es.size.toLong, es.map(_.rows).sum) }
        .getOrElse((0L, 0L))
    val (before, rows) = zoneState
    smallerThan match {
      case Some(minBytes) =>
        // incremental bin-packing: O(small files), not O(zone); with
        // ZORDER BY the packed tail z-orders on zone-global bounds
        graft.sources.v2.DirSink.compactSmall(spark, path, minBytes,
          clusterBy, zorderBy)
      case None =>
        val target = targetFiles.getOrElse(
          math.max(1, spark.sparkContext.defaultParallelism))
        graft.sources.v2.DirSink.compact(spark, path, target, clusterBy,
          zorderBy)
    }
    val (after, rowsAfter) = zoneState
    assert(rowsAfter == rows,
      s"OPTIMIZE must be row-preserving: $rows -> $rowsAfter")
    Seq(Row(before, after, rows))
  }
}

/** `REORG TABLE t APPLY (PURGE)` —
  * [[graft.sources.v2.DirSink.purgeVectors]] as SQL: rewrite ONLY the
  * deletion-vectored files into clean ones (one delta commit), leaving
  * every unvectored file's line verbatim — the targeted merge-on-read
  * debt payment (`t$files.dv_rows` is the scheduling signal). Returns
  * (files_purged, files_created, live_rows). */
case class ReorgZoneCommand(name: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_purged", LongType, nullable = false)(),
    AttributeReference("files_created", LongType, nullable = false)(),
    AttributeReference("live_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = ZoneResolve.zonePath(spark, name)
    def liveRows: Long = graft.sources.v2.DirSink
      .readManifestEntries(path)
      .map(_._2.map(e => e.rows - e.dv.map(_._2).getOrElse(0L)).sum)
      .getOrElse(0L)
    val before = liveRows
    val (purged, created) =
      graft.sources.v2.DirSink.purgeVectors(spark, path)
    assert(liveRows == before,
      s"REORG PURGE must preserve live rows: $before -> $liveRows")
    Seq(Row(purged.toLong, created.toLong, before))
  }
}

/** `VACUUM` — [[graft.sources.v2.DirSink.vacuum]] as SQL: sweep files
  * the live manifest does not reference and that are older than the
  * retention window (default 168 hours — Delta's). `DRY RUN` lists
  * without deleting. One row per swept (or would-sweep) file. */
case class VacuumZoneCommand(name: Seq[String], retainHours: Long,
                             dryRun: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("swept", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = ZoneResolve.zonePath(spark, name)
    graft.sources.v2.DirSink
      .vacuum(path, retainHours * 3600L * 1000L, dryRun = dryRun)
      .map(Row(_))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF g | TIMESTAMP AS OF t` — Delta's
  * RESTORE as SQL: [[graft.sources.v2.DirSink.restore]] publishes ONE
  * snapshot commit making the era the head again (schema, column
  * mapping, and layout headers travel back; the generation counter and
  * streaming epoch high-water only move forward). Timestamps accept an
  * ISO `'yyyy-mm-dd hh:mm:ss'` literal or bare epoch millis and
  * resolve to the newest generation committed at or before t. Returns
  * (restored_version, new_generation, files). */
case class RestoreZoneCommand(name: Seq[String], version: Option[Long],
                              tsMillis: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_generation", LongType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = ZoneResolve.zonePath(spark, name)
    val gen = version.getOrElse(
      graft.sources.v2.DirSink.genAsOf(path, tsMillis.get))
    val newGen = graft.sources.v2.DirSink.restore(path, gen)
    val files = graft.sources.v2.DirSink.readManifest(path)
      .map(_._2.size.toLong).getOrElse(0L)
    Seq(Row(gen, newGen, files))
  }
}

/** `CREATE TABLE t2 SHALLOW CLONE t1` — Delta's zero-copy clone as
  * SQL: [[graft.sources.v2.DirSink.cloneZone]] publishes t2's gen-0
  * snapshot referencing t1's current files by absolute path (no data
  * moved; see the cloneZone scaladoc for what carries, what resets,
  * and the source-vacuum caveat). The target name allocates its zone
  * directory through the SAME catalog layout rule as CREATE TABLE, so
  * the new zone is immediately loadable/listable — the catalog is
  * filesystem-backed, the published manifest IS the table. Returns
  * (source_version, files). */
case class CloneZoneCommand(target: Seq[String], source: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("source_version", LongType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = ZoneResolve.zonePath(spark, source)
    val dstPath = ZoneResolve.newZonePath(spark, target)
    val srcGen = graft.sources.v2.DirSink.cloneZone(srcPath, dstPath)
    val files = graft.sources.v2.DirSink.readManifest(dstPath)
      .map(_._2.size.toLong).getOrElse(0L)
    Seq(Row(srcGen, files))
  }
}

package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA-BASED (merge-on-read) row-level DML — `UPDATE` / `MERGE` /
  * group-shape `DELETE` writing DELETION VECTORS + appended files
  * instead of rewriting every touched file (Spark's `SupportsDelta`
  * surface; the Iceberg v2 merge-on-read design in kind, carried by
  * [[DirSinkDv]]'s vectors instead of positional delete files).
  * Selected when the session opts into vectors ([[DirSinkDv.EnabledKey]]);
  * otherwise the copy-on-write [[DirSinkRowLevelOperation]] runs, and
  * the two are answer-identical by construction (spec-pinned).
  *
  * How Spark drives it: `RewriteUpdateTable` / `RewriteMergeIntoTable`
  * / `RewriteDeleteFromTable` see `SupportsDelta` and plan a
  * `WriteDelta` instead of a `ReplaceData`: the target scan projects
  * the ROW ID — `(_file, _pos)`, this format's native row coordinate,
  * served by the scan's metadata columns with zero storage cost — and
  * the writer receives typed per-row calls. With
  * `representUpdateAsDeleteAndInsert` an UPDATE/MERGE-matched row
  * arrives as delete(id) + insert(row), exactly a vector bit plus an
  * ordinary appended row.
  *
  * Cost shape at 100 TB: a MERGE updating 0.1% of a zone reads the
  * join, writes 0.1%-sized appended files and a few KB of vectors —
  * the copy-on-write path rewrites every touched FILE (potentially
  * the whole zone under a non-clustered ON key). The read-side price
  * is the per-row bitset probe every vectored read already pays, and
  * OPTIMIZE remains the GC that folds vectors back into clean files.
  *
  * Concurrency: the scan records the generation it planned against;
  * the commit publishes through [[DirSink.publishAtGen]] — a
  * concurrent commit fails the DML loudly for the caller to re-issue
  * (the Delta/Iceberg discipline, same as the CoW path).
  *
  * Task → commit protocol: each task accumulates its dead positions
  * per file in bitsets and stages ONE partial vector per touched file
  * under the query's `_staging/<id>` (swept with the staging on
  * commit/abort); inserts flow through the ordinary staged writer.
  * The commit unions partials + the file's existing vector and writes
  * the final immutable vectors — driver I/O bounded by the compact
  * gap-varint bytes of the CHANGE, names and tags otherwise. */
class DirSinkDeltaRowLevelOperation(path: String, schema: StructType,
                                    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  /** Generation the row-id scan planned against — the optimistic
    * verify for the commit. */
  @volatile private[v2] var plannedGen: Option[Long] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"DirSinkDeltaDml($cmd, $path)"

  override def rowId():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(
      org.apache.spark.sql.connector.expressions.Expressions
        .column(DirSink.FileNameCol),
      org.apache.spark.sql.connector.expressions.Expressions
        .column(DirSinkDv.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array.empty // the row id alone carries the coordinate

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DirSinkScanBuilder(path, schema, None, None, None, None,
      planListener = Some((gen, _) => plannedGen = Some(gen)))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new DirSinkDeltaBatchWrite(path, info.schema(), info.queryId(),
            DirSinkDeltaRowLevelOperation.this)
      }
    }
}

/** One task's contribution: the ordinary staged-file message(s) for
  * its inserts plus (file → staged partial vector, bits) for its
  * deletes. */
case class DirSinkDeltaCommitMessage(
    inserts: Option[WriterCommitMessage],
    partials: Seq[(String, String)]) extends WriterCommitMessage

class DirSinkDeltaBatchWrite(path: String, schema: StructType,
                             queryId: String,
                             op: DirSinkDeltaRowLevelOperation)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    DirSinkDeltaWriterFactory(path, queryId,
      DirSinkWriterFactory.resolved(path, schema, queryId,
        DirSink.zoneFormat(path).getOrElse(DirSink.FormatText),
        DirSink.zoneBucket(path)))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = DirSink.fs(path)
    val root = new Path(path)
    val msgs = messages.collect { case m: DirSinkDeltaCommitMessage => m }
    val insertMsgs = DirSink.flattenMsgs(msgs.flatMap(_.inserts))
    val partialsByFile: Map[String, Seq[String]] =
      msgs.flatMap(_.partials).groupBy(_._1).map {
        case (file, ps) => file -> ps.map(_._2).toSeq
      }
    val gen = op.plannedGen.getOrElse(throw new IllegalStateException(
      "delta DML write committed without a planned scan generation"))
    val now = System.currentTimeMillis()
    DirSink.publishAtGen(path, gen, s"delta-${op.command()}", queryId) {
      parent =>
        // 1. inserts: rename staged files into place (inside the lock,
        //    like every committer — see DirSinkBatchWrite.commit)
        val committed = insertMsgs.map { m =>
          val fin = s"g$queryId-" +
            m.stagedName.stripPrefix(s"_staging/$queryId/")
          if (!f.rename(new Path(root, m.stagedName), new Path(root, fin)))
            throw new java.io.IOException(
              s"task-file publish failed: ${m.stagedName} -> $fin")
          m.copy(stagedName = fin)
        }
        val insertLines = committed.map { m =>
          s"${m.stagedName}\t${m.rows}\tt=$now\tb=${m.bytes}" +
            DirSink.bucketTag(m.bucket) +
            (if (m.stats.nonEmpty) s"\t${m.stats}" else "")
        }
        // 2. deletes: union each touched file's partials + its
        //    existing vector into ONE new immutable vector
        val byName = parent.lines.map(l => DirSink.parseEntry(l).name ->
          l).toMap
        val fullyDead = scala.collection.mutable.ArrayBuffer[String]()
        val retagged = partialsByFile.toSeq.flatMap { case (file, parts) =>
          val line = byName.getOrElse(file, throw new
              java.util.ConcurrentModificationException(
            s"row-id file $file left the manifest during the DML"))
          val e = DirSink.parseEntry(line)
          val bits = new java.util.BitSet()
          (parts ++ e.dv.map(_._1)).foreach(p =>
            bits.or(DirSinkDv.read(path, p)))
          val card = bits.cardinality().toLong
          if (card >= e.rows) { fullyDead += file; None }
          else Some(DirSink.withDvTag(line,
            Some((DirSinkDv.write(path, bits), card))))
        }
        val header0 = DirSink.nextHeader(Some(parent))
        val header =
          if (partialsByFile.isEmpty) header0
          else header0 + (DirSinkDv.HeaderKey -> "1")
        (DirSink.withHistory(header,
          op.command().toString.toLowerCase(java.util.Locale.ROOT),
          parent.lines.size - fullyDead.size + insertLines.size),
          DirSinkLog.DeltaCommit(retagged ++ insertLines,
            partialsByFile.keySet.toSeq))
    }
    f.delete(new Path(root, s"_staging/$queryId"), true)
    dropStagingRoot(f, root)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = DirSink.fs(path)
    messages.collect { case m: DirSinkDeltaCommitMessage => m }
      .flatMap(m => DirSink.flattenMsgs(m.inserts))
      .foreach(m => f.delete(new Path(path, m.stagedName), false))
    f.delete(new Path(path, s"_staging/$queryId"), true)
    dropStagingRoot(f, new Path(path))
  }

  private def dropStagingRoot(f: org.apache.hadoop.fs.FileSystem,
                              root: Path): Unit =
    try {
      val staging = new Path(root, "_staging")
      if (f.exists(staging) && f.listStatus(staging).isEmpty)
        f.delete(staging, false)
    } catch { case _: java.io.IOException => () } // a concurrent writer owns it
}

/** Executor side: inserts lazily open the ordinary staged writer;
  * deletes accumulate per-file bitsets, staged as one partial vector
  * per file at task commit. */
case class DirSinkDeltaWriterFactory(path: String, queryId: String,
                                     inner: DataWriterFactory)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private var innerW: DataWriter[InternalRow] = _
      private val dead =
        scala.collection.mutable.HashMap.empty[String, java.util.BitSet]

      override def delete(meta: InternalRow, id: InternalRow): Unit = {
        val file = id.getUTF8String(0).toString
        val pos = id.getLong(1)
        require(pos <= Int.MaxValue,
          s"row position $pos overflows the vector coordinate")
        dead.getOrElseUpdate(file, new java.util.BitSet).set(pos.toInt)
      }

      override def update(meta: InternalRow, id: InternalRow,
                          row: InternalRow): Unit = {
        // unreachable with representUpdateAsDeleteAndInsert, but the
        // semantics are exactly the pair
        delete(meta, id); insert(row)
      }

      override def insert(row: InternalRow): Unit = {
        if (innerW == null) innerW = inner.createWriter(partitionId, taskId)
        innerW.write(row)
      }

      override def commit(): WriterCommitMessage = {
        val partials = dead.toSeq.map { case (file, bits) =>
          (file, DirSinkDv.write(path, bits, s"_staging/$queryId"))
        }
        DirSinkDeltaCommitMessage(Option(innerW).map(_.commit()), partials)
      }

      override def abort(): Unit = if (innerW != null) innerW.abort()
      override def close(): Unit = if (innerW != null) innerW.close()
    }
}

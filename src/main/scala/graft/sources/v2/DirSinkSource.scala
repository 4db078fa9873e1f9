package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 WRITE path (the write half of the connector
  * story started by [[DocGenSource]]): a directory sink with the
  * task-commit protocol that makes a ten-thousand-task write safe under
  * retries and speculation at 100 TB —
  *
  *   - each task writes to a PRIVATE staging file
  *     (`_staging/<queryId>/p<partition>-t<taskId>`): concurrent
  *     attempts never collide, and an aborted task deletes only its
  *     own file,
  *   - task `commit()` returns the staged name as its commit message;
  *     Spark's output-commit coordinator guarantees at most one
  *     attempt per partition commits,
  *   - driver `commit(messages)` renames exactly the committed files
  *     into place, then publishes a MANIFEST (`_GRAFT_COMMIT`) by
  *     atomic rename — readers resolve the file list from the manifest
  *     alone, so a crash mid-commit leaves the previous generation
  *     fully readable and a straggling speculative attempt's orphan
  *     file is invisible,
  *   - `overwrite` (via `SupportsTruncate`) is a manifest swap: the new
  *     generation publishes atomically and superseded files are swept
  *     best-effort afterwards.
  *
  * All file ops go through the Hadoop [[FileSystem]] resolved from the
  * session configuration (works on hdfs:/s3a: roots, same as the
  * Layouts artifact guard). The row format is a plain escaped-text
  * line codec ([[DirSink.encode]]) over long/int/double/boolean/string
  * fields — the protocol is the point, the payload format is
  * deliberately trivial. Round-trip, retry, abort, and overwrite
  * semantics are pinned by DirSinkSpec.
  *
  * Usage:
  * `df.write.format("graft.sources.v2.DirSinkSource").option("path", p)
  *   .mode("append" | "overwrite").save()` and
  * `spark.read.format("graft.sources.v2.DirSinkSource")
  *   .option("path", p).load()`.
  */
class DirSinkSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DirSink.readManifestSchema(options.get("path"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DirSinkTable(properties.get("path"), schema)
}

object DirSink {
  val ManifestName = "_GRAFT_COMMIT"
  private val Sep = '\u0001'

  /** Driver side: the session's Hadoop configuration (credentials,
    * fs.* overrides). Executor side ([[DirSinkWriter]], the read-back
    * reader) has no active session — those use the executor's own
    * Hadoop configuration via [[execFs]], the standard site-config
    * path. */
  private[v2] def fs(path: String): FileSystem =
    new Path(path).getFileSystem(
      org.apache.spark.sql.SparkSession.active
        .sessionState.newHadoopConf())

  private[v2] def execFs(path: String): FileSystem =
    new Path(path).getFileSystem(
      new org.apache.hadoop.conf.Configuration())

  /** Manifest layout: line 1 = DDL schema; then one
    * `<fileName>\t<rowCount>` per committed file. */
  def readManifest(path: String): Option[(StructType, Seq[(String, Long)])] = {
    val f = fs(path)
    val m = new Path(path, ManifestName)
    if (!f.exists(m)) return None
    val in = f.open(m)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val schema = StructType.fromDDL(lines.head)
    val files = lines.tail.toSeq.map { l =>
      val Array(n, c) = l.split("\t"); (n, c.toLong)
    }
    Some((schema, files))
  }

  def readManifestSchema(path: String): StructType =
    readManifest(path).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"no ${ManifestName} manifest under $path — nothing was committed"))

  // ---- the line codec: \u0001-separated fields; backslash escapes;
  // a lone \0 token is SQL NULL
  private def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '\u0001' => "\\c"
      case '\n' => "\\n"
      case c => c.toString
    }

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '\\' => b += '\\'
          case 'c' => b += '\u0001'
          case 'n' => b += '\n'
          case o => b += o
        }
        i += 2
      } else { b += s(i); i += 1 }
    }
    b.toString
  }

  def encode(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "\\0"
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType => escape(row.getUTF8String(i).toString)
        case dt => throw new IllegalArgumentException(
          s"DirSink supports long/int/double/boolean/string, got $dt")
      }
    }.mkString("\u0001")

  def decode(line: String, schema: StructType): InternalRow = {
    // limit -1: a trailing EMPTY string field must survive the split
    val parts = line.split(Sep.toString, -1)
    new GenericInternalRow(schema.fields.zipWithIndex.map { case (f, i) =>
      val p = parts(i)
      if (p == "\\0") null
      else f.dataType match {
        case LongType => p.toLong
        case IntegerType => p.toInt
        case DoubleType => p.toDouble
        case BooleanType => p.toBoolean
        case StringType => UTF8String.fromString(unescape(p))
        case dt => throw new IllegalArgumentException(s"unsupported $dt")
      }
    }.toArray[Any])
  }
}

class DirSinkTable(path: String, schema0: StructType) extends Table
    with SupportsWrite with SupportsRead {
  override def name(): String = s"graft_dir_sink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DirSinkWriteBuilder(path, info.schema(), info.queryId())

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new DirSinkScan(path)
    }
}

class DirSinkWriteBuilder(path: String, schema: StructType, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new DirSinkBatchWrite(path, schema, queryId, doTruncate)
  }
}

case class DirSinkCommitMessage(stagedName: String, rows: Long)
    extends WriterCommitMessage

class DirSinkBatchWrite(path: String, schema: StructType, queryId: String,
                        truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DirSinkWriterFactory(path, schema, queryId)

  /** Publish: rename exactly the committed staging files into place,
    * then swap the manifest in atomically; sweep superseded/orphaned
    * files only AFTER the new generation is live. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = DirSink.fs(path)
    val root = new Path(path)
    f.mkdirs(root)
    val previous: Seq[(String, Long)] =
      if (truncate) Seq.empty
      else DirSink.readManifest(path).map(_._2).getOrElse(Seq.empty)
    val committed = messages.toSeq.map {
      case DirSinkCommitMessage(staged, rows) =>
        val fin = staged.stripPrefix(s"_staging/$queryId/")
        f.rename(new Path(root, staged), new Path(root, fin))
        (fin, rows)
    }
    val manifest = (schema.toDDL +:
      (previous ++ committed).map { case (n, c) => s"$n\t$c" })
      .mkString("\n")
    val tmp = new Path(root, s"${DirSink.ManifestName}.tmp-$queryId")
    val out = f.create(tmp, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    val live = new Path(root, DirSink.ManifestName)
    f.delete(live, false) // rename-over target (posix rename is atomic;
    f.rename(tmp, live)   // HDFS needs the delete — crash window is the
                          // delete..rename gap, previous data files intact)
    // best-effort sweep: staging leftovers of THIS query (loser
    // speculative attempts) and, on truncate, the superseded generation
    f.delete(new Path(root, s"_staging/$queryId"), true)
    dropStagingRootIfEmpty(f, root)
    if (truncate) {
      val liveSet = committed.map(_._1).toSet
      f.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        // dot-files are fs-internal (checksum siblings etc) — leave them
        if (!st.isDirectory && !n.startsWith(".") && !liveSet.contains(n) &&
          !n.startsWith(DirSink.ManifestName)) f.delete(st.getPath, false)
      }
    }
  }

  private def dropStagingRootIfEmpty(f: org.apache.hadoop.fs.FileSystem,
                                     root: Path): Unit =
    try {
      val staging = new Path(root, "_staging")
      if (f.exists(staging) && f.listStatus(staging).isEmpty)
        f.delete(staging, false)
    } catch { case _: java.io.IOException => () } // concurrent writer owns it

  /** Job abort: delete the files of tasks that already committed;
    * running tasks clean their own staging through DataWriter.abort. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = DirSink.fs(path)
    messages.foreach {
      case DirSinkCommitMessage(staged, _) =>
        f.delete(new Path(path, staged), false)
      case null => () // task that never reached commit
    }
    f.delete(new Path(path, s"_staging/$queryId"), true)
    dropStagingRootIfEmpty(f, new Path(path))
  }
}

class DirSinkWriterFactory(path: String, schema: StructType, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DirSinkWriter(path, schema, queryId, partitionId, taskId)
}

/** One task attempt's writer: a private staging file named by
  * (partition, taskId) — attempt-unique, so speculation never
  * collides. */
class DirSinkWriter(path: String, schema: StructType, queryId: String,
                    partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val stagedName = s"_staging/$queryId/p$partitionId-t$taskId"
  private val f = DirSink.execFs(path) // executor side: no active session
  private val out = f.create(new Path(path, stagedName), true)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    out.write((DirSink.encode(record, schema) + "\n").getBytes("UTF-8"))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    DirSinkCommitMessage(stagedName, rows)
  }

  override def abort(): Unit = {
    out.close()
    f.delete(new Path(path, stagedName), false)
  }

  override def close(): Unit = ()
}

// ------------------------------------------------------- read-back scan

case class DirSinkFilePartition(path: String, file: String, ddl: String)
    extends InputPartition

/** Manifest-driven read: one input partition per committed file;
  * orphans and staging files are invisible by construction. */
class DirSinkScan(path: String) extends Scan with Batch {
  private val (schema, files) = DirSink.readManifest(path).getOrElse(
    (StructType(Nil), Seq.empty[(String, Long)]))

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"DirSinkScan($path, files=${files.size})"

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (n, _) =>
      DirSinkFilePartition(path, n, schema.toDDL): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[DirSinkFilePartition]
        val sch = StructType.fromDDL(p.ddl)
        val in = DirSink.execFs(p.path).open(new Path(p.path, p.file))
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.split("\n").filter(_.nonEmpty).iterator
          finally in.close()
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = { val h = lines.hasNext
            if (h) cur = DirSink.decode(lines.next(), sch); h }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

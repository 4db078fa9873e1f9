package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 read path (SURVEY.md §2.1 sources tier, beyond
  * the declared-only `Tables.jdbc`): a deterministic synthetic-document
  * generator exposed as a Spark table with REAL scan pushdown —
  *
  *   - `SupportsPushDownFilters`: `doc_id` range/equality predicates
  *     narrow the generated id range BEFORE any row exists (the DSv2
  *     analog of parquet row-group skipping; non-id filters are returned
  *     as residuals for Spark to evaluate),
  *   - `SupportsPushDownRequiredColumns`: the reader materializes only
  *     the projected fields,
  *   - `planInputPartitions`: the range splits into `slices` independent
  *     partitions, so the source scales out like any file scan.
  *
  * This is the connector shape a production deployment implements
  * against its real backing store (the reference's PostgreSQL,
  * /root/reference/probe.py:4); the generator stands in for the store so
  * the contract is testable with zero egress (Dsv2Spec). Usage:
  * `spark.read.format("graft.sources.v2.DocGenSource")
  *   .option("rows", n).option("slices", k).load()`.
  */
class DocGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DocGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object DocGen {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val Langs: IndexedSeq[String] = IndexedSeq("de", "en", "es", "fr", "zh")

  /** The deterministic row function (id → attributes); the whole source
    * is this function plus pushdown bookkeeping. */
  def lang(id: Long): String = Langs((id % 5).toInt)
  def nChars(id: Long): Long = 50L + (id * 37L) % 950L
}

class DocGenTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"docgen(rows=$rows)"
  override def schema(): StructType = DocGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, slices)
}

class DocGenScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L        // inclusive
  private var hi = rows      // exclusive
  private var pushed = Array.empty[Filter]
  private var required = DocGen.Schema

  private def longOf(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  /** Fold a doc_id predicate into the [lo, hi) range; true = fully
    * absorbed by the source (Spark need not re-evaluate it). */
  private def absorb(f: Filter): Boolean = f match {
    case EqualTo("doc_id", v) => longOf(v).exists { x =>
      lo = math.max(lo, x); hi = math.min(hi, x + 1); true
    }
    case GreaterThan("doc_id", v) => longOf(v).exists { x =>
      lo = math.max(lo, x + 1); true
    }
    case GreaterThanOrEqual("doc_id", v) => longOf(v).exists { x =>
      lo = math.max(lo, x); true
    }
    case LessThan("doc_id", v) => longOf(v).exists { x =>
      hi = math.min(hi, x); true
    }
    case LessThanOrEqual("doc_id", v) => longOf(v).exists { x =>
      hi = math.min(hi, x + 1); true
    }
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(absorb)
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new DocGenScan(math.min(lo, hi), hi, slices, required, pushed)
}

case class DocGenRange(lo: Long, hi: Long) extends InputPartition

class DocGenScan(val lo: Long, val hi: Long, slices: Int,
                 required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"DocGenScan range=[$lo,$hi) PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0) Array.empty
    else (0 until slices).flatMap { i =>
      val a = lo + i * n / slices
      val b = lo + (i + 1) * n / slices
      if (b > a) Some(DocGenRange(a, b)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required)
}

class DocGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[DocGenRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      // column pruning happens HERE: only projected fields materialize
      private val getters: Array[Long => Any] = required.fields.map {
        _.name match {
          case "doc_id" => (i: Long) => i
          case "lang" => (i: Long) => UTF8String.fromString(DocGen.lang(i))
          case "n_chars" => (i: Long) => DocGen.nChars(i)
        }
      }
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(_(id)))
      override def close(): Unit = ()
    }
  }
}

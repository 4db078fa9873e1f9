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
  *   - `SupportsPushDownLimit` (round 10): a `LIMIT n` narrows the
  *     generated range itself — fully pushed, so Spark plans no limit
  *     of its own,
  *   - `SupportsPushDownAggregates` (round 10): COMPLETE pushdown of
  *     count/count(col)/min/max/sum, optionally grouped by `lang` —
  *     the generator's row function is closed-form, so every aggregate
  *     is computed from the id-range arithmetic (per-class counts and
  *     arithmetic series; the `n_chars` residue sequence is periodic
  *     with period ≤190, so its sum/min/max cost a ≤190-step loop) and
  *     a `groupBy(lang).count()` over a trillion virtual rows never
  *     materializes a row. This is the DSv2 analog of a store-side
  *     aggregate (the shape a warehouse connector pushes to its SQL
  *     backend),
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var lo = 0L        // inclusive
  private var hi = rows      // exclusive
  private var pushed = Array.empty[Filter]
  private var required = DocGen.Schema
  private var limited = false
  private var agg: Option[(Boolean, Seq[DocGenAgg])] = None

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

  /** LIMIT n narrows the id range itself; fully pushed (the generator
    * is ordered and the narrowed range yields exactly ≤n rows across
    * all slices), so Spark drops its own limit.
    *
    * NOT when an aggregation was already pushed: Spark applies
    * pushDownLimitAndOffset AFTER pushDownAggregates on the same
    * builder, so narrowing the raw id range here would compute the
    * (completely pushed) aggregates over only `limit` input rows —
    * silently wrong group counts. A limit over an aggregate limits the
    * aggregate's OUTPUT rows, so we decline and let Spark keep its own
    * limit operator over the aggregated result. */
  override def pushLimit(limit: Int): Boolean = {
    if (agg.isDefined) return false
    hi = math.min(hi, math.max(lo, 0L) + limit)
    limited = true
    true
  }

  import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
  import org.apache.spark.sql.connector.expressions.aggregate._

  private def colOf(e: Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  private val NumCols = Set("doc_id", "n_chars")

  /** The aggregations this source computes in closed form: grouped by
    * nothing or by `lang`; count(*) / count(col) (no column is ever
    * null) / min / max / sum over the two numeric fields. */
  private def translate(a: Aggregation): Option[(Boolean, Seq[DocGenAgg])] = {
    val byLang = a.groupByExpressions() match {
      case Array() => Some(false)
      case Array(e) if colOf(e).contains("lang") => Some(true)
      case _ => None
    }
    val specs: Seq[Option[DocGenAgg]] = a.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(DocGenAgg("count", "*"))
      case c: Count if !c.isDistinct =>
        colOf(c.column()).map(DocGenAgg("count", _))
      case m: Min => colOf(m.column()).filter(NumCols)
        .map(DocGenAgg("min", _))
      case m: Max => colOf(m.column()).filter(NumCols)
        .map(DocGenAgg("max", _))
      case s: Sum if !s.isDistinct => colOf(s.column()).filter(NumCols)
        .map(DocGenAgg("sum", _))
      case _ => None
    }
    for {
      b <- byLang
      if specs.forall(_.isDefined)
      // SUM overflow guard: the closed-form series uses exact arithmetic
      // (Math.multiplyExact/addExact, None on wrap); if any requested
      // sum over the CURRENT [lo,hi) range would wrap a Long, refuse the
      // pushdown so Spark aggregates the raw scan itself and applies its
      // own (ANSI) overflow semantics instead of silently returning
      // wrapped garbage. Filters push before aggregates, so [lo,hi) is
      // final here.
      if sumsFit(specs.flatten.filter(_.op == "sum").map(_.col))
    } yield (b, specs.flatten)
  }

  private def sumsFit(sumCols: Seq[String]): Boolean = {
    if (sumCols.isEmpty) return true
    // per-class sums AND the ungrouped all-class merge must both fit
    val perClass =
      (0 until 5).map(DocGenClosedForm.classStats(math.min(lo, hi), hi, _))
    val all = perClass.reduce(DocGenClosedForm.merge)
    (perClass :+ all).forall(s => sumCols.forall {
      case "doc_id" => s.sumId.isDefined
      case "n_chars" => s.sumChars.isDefined
    })
  }

  override def supportCompletePushDown(a: Aggregation): Boolean =
    translate(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean =
    translate(a) match {
      case Some(t) => agg = Some(t); true
      case None => false
    }

  override def build(): Scan = agg match {
    case Some((byLang, specs)) =>
      new DocGenAggScan(math.min(lo, hi), hi, byLang, specs, pushed)
    case None =>
      new DocGenScan(math.min(lo, hi), hi, slices, required, pushed,
        limited)
  }
}

case class DocGenRange(lo: Long, hi: Long) extends InputPartition
case class DocGenIdList(ids: Array[Long]) extends InputPartition

class DocGenScan(val lo: Long, val hi: Long, slices: Int,
                 required: StructType, pushed: Array[Filter],
                 limited: Boolean = false)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  /** Exact statistics — the generator knows its cardinality in closed
    * form (post-pushdown range, or the runtime-filtered id count), so
    * Spark's join planner can auto-broadcast a small generated slice
    * instead of assuming a V2 relation is infinitely large. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows: Long =
      runtimeIds.map(_.length.toLong).getOrElse(math.max(hi - lo, 0L))
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * required.defaultSize)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  /** Runtime (execution-time) narrowing — the DSv2 analog of dynamic
    * partition pruning: when this scan is the fact side of a join whose
    * dim side carries a selective predicate, Spark evaluates the dim
    * FIRST (reusing its broadcast) and hands the join keys here as an
    * `In` filter before any input partition is planned. The generator
    * then produces ONLY those ids — at a warehouse this is the
    * difference between scanning the keyed rows and scanning the
    * table. Non-translatable runtime filters are ignored, which is
    * always safe: runtime filters are advisory (the join re-applies
    * them). */
  private var runtimeIds: Option[Array[Long]] = None

  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("doc_id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("doc_id", vs) =>
      val ids = vs.collect { case n: Number => n.longValue() }
        .filter(x => x >= lo && x < hi).distinct.sorted
      runtimeIds = Some(ids)
    case _ => ()
  }

  /** Test aid: how many ids survived runtime filtering (None = no
    * runtime filter arrived). */
  private[graft] def runtimeNarrowedTo: Option[Int] = runtimeIds.map(_.length)

  override def readSchema(): StructType = required

  override def description(): String =
    s"DocGenScan range=[$lo,$hi)${if (limited) " PushedLimit" else ""}" +
      s" PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = runtimeIds match {
    case Some(ids) =>
      if (ids.isEmpty) Array.empty
      else ids.grouped(math.max(1, ((ids.length + slices - 1) / slices)))
        .map(DocGenIdList(_): InputPartition).toArray
    case None =>
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
    // column pruning happens HERE: only projected fields materialize
    val getters: Array[Long => Any] = required.fields.map {
      _.name match {
        case "doc_id" => (i: Long) => i
        case "lang" => (i: Long) => UTF8String.fromString(DocGen.lang(i))
        case "n_chars" => (i: Long) => DocGen.nChars(i)
      }
    }
    val ids: Iterator[Long] = partition match {
      case DocGenRange(lo, hi) => new Iterator[Long] {
        private var c = lo
        override def hasNext: Boolean = c < hi
        override def next(): Long = { val v = c; c += 1; v }
      }
      case DocGenIdList(list) => list.iterator
    }
    new PartitionReader[InternalRow] {
      private var id = 0L
      override def next(): Boolean = { val h = ids.hasNext
        if (h) id = ids.next(); h }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(_(id)))
      override def close(): Unit = ()
    }
  }
}

/** One pushed aggregate: op ∈ count|min|max|sum over a field ("*" for
  * count(*)). */
case class DocGenAgg(op: String, col: String)

case class DocGenAggPartition(lo: Long, hi: Long, byLang: Boolean,
                              specs: Seq[DocGenAgg]) extends InputPartition

/** Complete-pushdown aggregate scan: one input partition whose reader
  * computes every aggregate from the id-range arithmetic — O(1) in the
  * row count (the `n_chars` residue walk is bounded by its ≤190-step
  * period). */
class DocGenAggScan(lo: Long, hi: Long, byLang: Boolean,
                    specs: Seq[DocGenAgg], pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = {
    val groupCols =
      if (byLang) Seq(StructField("lang", StringType, nullable = false))
      else Seq.empty
    // all aggregates here are long-typed: counts by definition, and
    // min/max/sum over the two BIGINT fields (null only on empty input)
    StructType(groupCols ++ specs.map(s =>
      StructField(s"${s.op}(${s.col})", LongType, nullable = true)))
  }

  override def description(): String =
    s"DocGenAggScan range=[$lo,$hi) PushedAggregation: " +
      s"[${specs.map(s => s"${s.op}(${s.col})").mkString(", ")}]" +
      s"${if (byLang) " groupBy: [lang]" else ""}" +
      s" PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenAggPartition(lo, hi, byLang, specs))

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenAggReaderFactory
}

/** Closed-form stats of one lang class (ids ≡ r mod 5 in [lo, hi)).
  * The two SUM series are computed with EXACT arithmetic
  * (Math.multiplyExact/addExact) and carried as Option — an overflow
  * yields None instead of a wrapped Long. The builder's pre-push
  * dry-run ([[DocGenScanBuilder.sumsFit]]) refuses a sum pushdown
  * whose value is None, so the connector never returns a
  * silently-wrapped sum for the advertised trillion-row ranges, while
  * count/min/max (which never overflow) still push at any scale. */
object DocGenClosedForm {
  import java.lang.Math.{addExact, multiplyExact}

  case class ClassStats(cnt: Long, minId: Long, maxId: Long,
      sumId: Option[Long], minChars: Long, maxChars: Long,
      sumChars: Option[Long])

  private def exact(f: => Long): Option[Long] =
    try Some(f) catch { case _: ArithmeticException => None }

  def classStats(lo: Long, hi: Long, r: Int): ClassStats = {
    val r0 = lo + (((r - lo) % 5) + 5) % 5 // first id ≥ lo in the class
    if (r0 >= hi)
      return ClassStats(0L, 0L, 0L, Some(0L), 0L, 0L, Some(0L))
    val cnt = (hi - 1 - r0) / 5 + 1
    val maxId = r0 + 5L * (cnt - 1) // < hi by construction, never wraps
    // cnt·(cnt-1)/2 without the intermediate cnt·(cnt-1) wrap: halve
    // the even factor first, then multiply exactly
    val sumId = exact {
      val tri = if (cnt % 2 == 0) multiplyExact(cnt / 2, cnt - 1)
                else multiplyExact(cnt, (cnt - 1) / 2)
      addExact(multiplyExact(cnt, r0), multiplyExact(5L, tri))
    }
    // n_chars(id_t) = 50 + (c0 + 185·t) mod 950 for t in [0, cnt):
    // gcd(185, 950) = 5 ⇒ the residue sequence has period 950/5 = 190
    val c0 = ((37L * r0) % 950 + 950) % 950
    val period = 190
    var t = 0
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var cycleSum = 0L
    var remSum = 0L
    val rem = cnt % period
    val walk = math.min(cnt, period.toLong).toInt
    while (t < period) {
      val v = (c0 + 185L * t) % 950
      if (t < walk) { if (v < mn) mn = v; if (v > mx) mx = v }
      if (t < rem) remSum += v
      cycleSum += v
      t += 1
    }
    val sumChars = exact(addExact(addExact(multiplyExact(50L, cnt),
      multiplyExact(cnt / period, cycleSum)), remSum))
    ClassStats(cnt, r0, maxId, sumId, 50L + mn, 50L + mx, sumChars)
  }

  private def addOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    for (x <- a; y <- b; s <- exact(addExact(x, y))) yield s

  def merge(a: ClassStats, b: ClassStats): ClassStats =
    if (a.cnt == 0) b else if (b.cnt == 0) a
    else ClassStats(a.cnt + b.cnt, math.min(a.minId, b.minId),
      math.max(a.maxId, b.maxId), addOpt(a.sumId, b.sumId),
      math.min(a.minChars, b.minChars),
      math.max(a.maxChars, b.maxChars), addOpt(a.sumChars, b.sumChars))
}

class DocGenAggReaderFactory extends PartitionReaderFactory {
  import DocGenClosedForm.{classStats, ClassStats}

  private def cell(s: ClassStats, a: DocGenAgg): Any = a match {
    case DocGenAgg("count", _) => s.cnt
    case DocGenAgg("min", "doc_id") => if (s.cnt == 0) null else s.minId
    case DocGenAgg("max", "doc_id") => if (s.cnt == 0) null else s.maxId
    case DocGenAgg("sum", "doc_id") =>
      if (s.cnt == 0) null
      else s.sumId.getOrElse(throw new IllegalStateException(
        "unreachable: an overflowing sum is refused at pushdown"))
    case DocGenAgg("min", "n_chars") => if (s.cnt == 0) null else s.minChars
    case DocGenAgg("max", "n_chars") => if (s.cnt == 0) null else s.maxChars
    case DocGenAgg("sum", "n_chars") =>
      if (s.cnt == 0) null
      else s.sumChars.getOrElse(throw new IllegalStateException(
        "unreachable: an overflowing sum is refused at pushdown"))
    case other =>
      throw new IllegalStateException(s"unreachable pushed agg: $other")
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenAggPartition]
    val perClass = (0 until 5).map(r => r -> classStats(p.lo, p.hi, r))
    val rows: Seq[InternalRow] =
      if (p.byLang)
        perClass.filter(_._2.cnt > 0).map { case (r, s) =>
          new GenericInternalRow(
            (UTF8String.fromString(DocGen.Langs(r)) +:
              p.specs.map(cell(s, _))).toArray[Any])
        }
      else {
        val all = perClass.map(_._2).reduce(DocGenClosedForm.merge)
        Seq(new GenericInternalRow(p.specs.map(cell(all, _)).toArray[Any]))
      }
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext
        if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

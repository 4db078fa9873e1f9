package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build aggregate over a BIGINT key column → serialized
  * filter (BINARY). The explicit surface of the semi-join-reduction
  * pattern: at 100 TB the dimension side of a join is often far too big
  * to broadcast as ROWS, but its key set compresses into a few MB of
  * Bloom bitset with a bounded false-positive rate — broadcast THAT and
  * pre-filter the fact before the shuffle. No false negatives means the
  * subsequent real join restores exactness: the composed result is
  * bit-identical to the plain join, so the operator is fully
  * oracle-checkable (the oracle simply omits the bloom).
  *
  * Spark applies this internally (runtime row-level filtering) only
  * under its own heuristics; `graft_bloom_agg` + `graft_bloom_contains`
  * make it a first-class, user-directed operator (the reference's
  * sandbox delegates all join planning to Postgres — no such lever;
  * capability addition per SURVEY.md §2.10).
  *
  * Mergeability: the bitset merges by OR (commutative/associative), so
  * partial aggregation works and the result is independent of
  * partitioning. Hashing is Spark's `util.sketch` Murmur3 with a fixed
  * seed — deterministic across JVMs.
  */
case class BloomKeysAgg(
    child: Expression,
    expectedItems: Long = 1000000L,
    fpp: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT/INT key, got ${other.sql}")
    }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long    => buf.putLong(l)
      case i: java.lang.Integer => buf.putLong(i.longValue())
    }
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomKeysAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomKeysAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomKeysAgg =
    copy(child = newChildren.head)
}

/** Probe of a serialized Bloom filter: `graft_bloom_contains(bloom, key)`
  * → BOOLEAN. The bloom side must be query-constant (a literal or a
  * scalar subquery — the idiomatic shape is
  * `WHERE graft_bloom_contains((SELECT graft_bloom_agg(k) FROM dim), fact_key)`),
  * which Spark evaluates once and feeds to every row as the same object;
  * the deserialized filter is cached by reference identity, so the
  * per-fact-row cost is j Murmur3 probes, no per-row deserialization.
  *
  * Runs inside whole-stage codegen (the generated code calls back into
  * [[probe]] via a reference object), so the hot fact-scan stage stays
  * fused. Cache updates are benign under task-thread races (worst case:
  * a redundant deserialization; each thread reads its own snapshot).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY bloom, BIGINT/INT key), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient @volatile private var cached: (Array[Byte], BloomFilter) = _

  def probe(bytes: Array[Byte], key: Long): Boolean = {
    var c = cached
    if (c == null || (c._1 ne bytes)) {
      c = (bytes, BloomFilter.readFrom(new ByteArrayInputStream(bytes)))
      cached = c
    }
    c._2.mightContainLong(key)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val key = r match {
      case i: java.lang.Integer => i.longValue()
      case other                => other.asInstanceOf[java.lang.Long].longValue()
    }
    probe(l.asInstanceOf[Array[Byte]], key)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"${ev.value} = $ref.probe($b, (long) $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

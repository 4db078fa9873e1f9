package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native point-query into a serialized Count-Min sketch: given the
  * BINARY produced by Spark's `count_min_sketch(...)` aggregate and a
  * string item, return the sketch's (over-)estimate of the item's
  * frequency. Spark ships the CMS *builder* as an aggregate but no SQL
  * surface to READ the sketch — estimates otherwise require collecting
  * the binary to the driver, which breaks the declarative pipeline.
  * This expression closes that loop so a sketch built in one pass can
  * be probed by an ordinary (broadcast) join stage.
  *
  * Hash compatibility: `CountMinSketchAgg` feeds string inputs to the
  * sketch as their UTF-8 bytes, and `CountMinSketch.estimateCount`
  * hashes a `String` item through the identical UTF-8 path, so probing
  * with the string column is exact w.r.t. what the aggregate inserted.
  *
  * Cost model: deserializing the sketch is O(width·depth) — this is a
  * PROBE-side expression, evaluated once per candidate row against a
  * broadcast 1-row sketch relation, never per corpus row (the corpus
  * pass is the aggregate). Eval-native (no codegen) is fine at probe
  * cardinality.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY sketch, STRING item), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // cache the deserialized sketch across probe rows of one partition
  // (the sketch binary is identical for every row of a broadcast join)
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(l: Any, r: Any): Any = {
    val bytes = l.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedBytes = bytes.clone()
      cachedSketch = CountMinSketch.readFrom(bytes)
    }
    cachedSketch.estimateCount(r.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions for the dedup pipelines. Both are
  * EXACT replicas of the SQL formulations they replace (and of the DuckDB
  * oracle): lowercase → split(' ') → 3-token shingles → md5 hex → fold of
  * the leading 15 hex digits (base 16) mod 1e9+7 → first-occurrence
  * distinct. A JVM loop with one MessageDigest per partition-row beats the
  * interpreted per-element lambda evaluation of the HOF pipeline by an
  * order of magnitude, which is what the 5000²-pair Jaccard joins need.
  * CodegenFallback: the per-ROW overhead is one virtual call; the loops
  * inside are already compiled Scala.
  */
object TextHashing {
  final val P = 1000000007L

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private final val HEX = "0123456789abcdef".toCharArray

  /** fold of the first 15 hex digits of md5(s) (≡ CAST(conv(substr(md5(x),
    * 1, 15), 16, 10) AS BIGINT) % p). */
  def hash15(s: String): Long = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + high nibble of byte 8
    var acc = 0L
    var i = 0
    while (i < 7) {
      val b = bytes(i) & 0xff
      acc = acc * 16 + (b >> 4)
      acc = acc * 16 + (b & 0xf)
      i += 1
    }
    acc = acc * 16 + ((bytes(7) & 0xff) >> 4)
    acc % P
  }

  /** Distinct hashed 3-shingles of a document, SORTED ascending. The sort
    * is load-bearing for [[IntersectSize]]'s merge loop; no consumer
    * (Jaccard size, MinHash minima) observes element order, so the
    * DuckDB oracle's unsorted `list_distinct` stays equivalent. */
  def shingleHashes(text: String): Array[Long] = {
    val toks = text.toLowerCase.split(" ", -1)
    val out = new java.util.TreeSet[java.lang.Long]()
    if (toks.length >= 3) {
      var i = 0
      while (i + 2 < toks.length) {
        out.add(hash15(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)))
        i += 1
      }
    } else out.add(hash15(text.toLowerCase))
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }

  /** |A ∩ B| for two SORTED distinct long arrays (single merge pass —
    * no per-pair hash set like `array_intersect`). */
  def intersectSize(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  /** 16-bit SimHash over token occurrences: bit j−1 (j = 1..16) is set
    * when the ±1 votes from hex digit j of each token's md5 sum positive.
    * Exact replica of the SQL/DuckDB pipeline in q_dedup_simhash. */
  def simhash16(text: String): Long = {
    val toks = text.toLowerCase.split(" ", -1)
    val votes = new Array[Int](16)
    val d = digest.get()
    var i = 0
    while (i < toks.length) {
      d.reset()
      val bytes = d.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // hex digit j (1-based) = high/low nibble of byte (j-1)/2
      var j = 0
      while (j < 16) {
        val b = bytes(j / 2) & 0xff
        val nib = if (j % 2 == 0) b >> 4 else b & 0xf
        votes(j) += (if (nib % 2 == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) acc += 1L << j
      j += 1
    }
    acc
  }

  /** 16 MinHash minima under affine permutations
    * h_k = ((2k+1)·h + 7919·(k+1)) mod p, k = 0..15. */
  def minhashSig(hashes: Array[Long]): Array[Long] = {
    val sig = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var k = 0
      while (k < 16) {
        val v = ((2 * k + 1) * h + 7919L * (k + 1)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }
}

/** `graft_shingle_hashes(text)` → ARRAY<BIGINT>. */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHashing.shingleHashes(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** `graft_simhash(text)` → BIGINT (16-bit SimHash of the tokenized text). */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashing.simhash16(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): SimHash16 =
    copy(child = c)
}

/** `graft_intersect_size(a, b)` → INT; requires both arrays sorted
  * (the [[ShingleHashes]] contract). */
case class IntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }
  override def prettyName: String = "graft_intersect_size"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    TextHashing.intersectSize(
      l.asInstanceOf[ArrayData].toLongArray(),
      r.asInstanceOf[ArrayData].toLongArray())
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectSize = copy(left = l, right = r)
}

/** `graft_minhash_sig(hashes)` → ARRAY<BIGINT> of the 16 band minima. */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
  }
  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    new GenericArrayData(TextHashing.minhashSig(a.toLongArray()))
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rank-ordered BPE merge encoding as a single native pass.
  *
  * Semantics are EXACTLY the wrapped-char replace chain it replaces
  * (TextOps.bpeEncodeSql, kept as the spec'd reference): for each merge
  * rule in rank order, one left-to-right non-overlapping pass replaces
  * every adjacent (a, b) token pair with the merged token; text produced
  * by a rule is not re-scanned by that same rule (a literal `replace`
  * never re-scans its replacement), but IS visible to later ranks —
  * Sennrich et al.'s canonical apply-merges-in-order encoder. BpeSpec
  * proves the native form ≡ the SQL form token-for-token on the corpus.
  *
  * Why native: the SQL form materializes 17 intermediate strings per word
  * (char wrapping + one per rule) at 3× the char count (the parens). The
  * loop here runs the same 16 rank passes over a shrinking token array
  * with zero wrapping — one allocation per pass, compiled Scala.
  * CodegenFallback like the other graft expressions: per-row overhead is
  * one virtual call, the loop is already compiled.
  */
object BpeEncoding {

  /** Rank-ordered merge table (shared by the Spark query, the SQL
    * reference form, and the DuckDB oracle — single-sourced here).
    * Multi-level chains included: t+h→th→the, i+n→in→ing. */
  val MERGES: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g",
    "a" -> "n", "an" -> "d", "e" -> "r", "r" -> "e",
    "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "t" -> "i", "e" -> "s", "s" -> "t", "l" -> "e")

  private val mergesArr: Array[(String, String)] = MERGES.toArray

  /** Encode one non-empty cleaned word to its BPE token sequence. */
  def encode(word: String): Array[String] = {
    var toks = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      toks(i) = String.valueOf(word.charAt(i)); i += 1
    }
    var r = 0
    while (r < mergesArr.length) {
      val (a, b) = mergesArr(r)
      // left-to-right non-overlapping merge pass, in place into a new
      // array (at most the same length)
      val out = new Array[String](toks.length)
      var n = 0
      var j = 0
      while (j < toks.length) {
        if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) {
          out(n) = a + b; n += 1; j += 2
        } else {
          out(n) = toks(j); n += 1; j += 1
        }
      }
      toks = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      r += 1
    }
    toks
  }
}

/** `graft_bpe_tokens(word)` → ARRAY<STRING> of BPE tokens. */
case class BpeTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def prettyName: String = "graft_bpe_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val toks = BpeEncoding.encode(input.asInstanceOf[UTF8String].toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): BpeTokens =
    copy(child = c)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge semantics (q_token_bpe): the fixed merge table must apply in
  * rank order with left-to-right non-overlapping matches per rule — the
  * canonical Sennrich apply-merges-in-order encoder. These words pin the
  * behaviors that distinguish real BPE from naive substring replacement. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def encode(words: String*): Map[String, Seq[String]] = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    words.toDF("word")
      .select($"word", operators.TextOps.bpeEncode($"word").as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
  }

  test("multi-level merges chain: t+h -> th, th+e -> the") {
    val m = encode("the", "then", "thing")
    assert(m("the") == Seq("the"))
    // rank 2 (th+e) consumed th before rank 11 (e+n) could see the e
    assert(m("then") == Seq("the", "n"))
    // i+n merges at rank 3, then in+g at rank 4; th stays unmerged
    assert(m("thing") == Seq("th", "ing"))
  }

  test("rank order wins over textual order") {
    // "ander": a+n (rank 5) takes the n, then an+d (rank 6), then e+r
    // (rank 7) — NOT e+n, whose rank 11 comes too late
    assert(encode("ander")("ander") == Seq("and", "er"))
    // "rest": r+e merges at rank 8 before s+t at rank 15
    assert(encode("rest")("rest") == Seq("re", "st"))
  }

  test("left-to-right non-overlapping within one rule") {
    // t t h h: single (t)(h) occurrence merges in the middle
    assert(encode("tthh")("tthh") == Seq("t", "th", "h"))
    // e e s: e+s takes the SECOND e (first pair match scanning l-to-r
    // is at positions 2-3), leaving a bare e
    assert(encode("ees")("ees") == Seq("e", "es"))
  }

  test("unmergeable words stay as base characters") {
    assert(encode("xyz")("xyz") == Seq("x", "y", "z"))
    assert(encode("a")("a") == Seq("a"))
  }

  test("native == SQL chain exhaustively over merge-dense short words") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // every length-4 word over the 6 chars that drive the t/th/the/in/ing
    // chains (1296) + every length-3 word over the an/and/er/es/st chars
    // (216): exhaustive coverage of rank-collision and overlap cases far
    // beyond what the corpus vocabulary exercises
    val a1 = "theing".toSeq
    val a2 = "anders".toSeq
    val words =
      (for (c1 <- a1; c2 <- a1; c3 <- a1; c4 <- a1)
        yield s"$c1$c2$c3$c4") ++
      (for (c1 <- a2; c2 <- a2; c3 <- a2) yield s"$c1$c2$c3")
    val both = words.toDF("word")
      .select($"word",
        operators.TextOps.bpeEncode($"word").as("native"),
        operators.TextOps.bpeEncodeSql($"word").as("sql"))
      .filter(!($"native" === $"sql"))
      .collect()
    assert(both.isEmpty,
      s"native != sql for ${both.length} words, e.g. ${both.take(3).mkString(", ")}")
  }

  test("native single-pass encoder equals the SQL replace chain on every corpus word") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val words = graft.sources.Tables
      .load(spark, TestSession.sfDir, "documents")
      .select(explode(split(lower($"text"), " ")).as("w"))
      .select(regexp_replace($"w", "[^a-z0-9]", "").as("word"))
      .filter(length($"word") > 0)
      .distinct()
    val crafted = Seq("the", "then", "thing", "ander", "rest", "tthh",
      "ees", "xyz", "a", "thethethe", "ananan", "lest", "ingest")
      .toDF("word")
    val both = words.unionByName(crafted)
      .select($"word",
        operators.TextOps.bpeEncode($"word").as("native"),
        operators.TextOps.bpeEncodeSql($"word").as("sql"))
      .withColumn("eq", $"native" === $"sql")
    val bad = both.filter(!$"eq").collect()
    assert(bad.isEmpty, s"native != sql for: ${bad.take(5).mkString(", ")}")
  }
}

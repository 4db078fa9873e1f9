package graft

import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash dedup guarantees (q_multimodal_phash): the banded
  * candidate join loses NOTHING under the τ=3 Hamming cut (pigeonhole:
  * ≤3 differing bits cannot touch all 4 bands), and the planted
  * re-encode twins are recovered — properties the DuckDB gate (Spark ≡
  * DuckDB) cannot itself establish. */
class PhashSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  private def ham(a: operators.Multimodal.PHashBands,
                  b: operators.Multimodal.PHashBands): Long =
    java.lang.Long.bitCount(a.b0 ^ b.b0) + java.lang.Long.bitCount(a.b1 ^ b.b1) +
      java.lang.Long.bitCount(a.b2 ^ b.b2) + java.lang.Long.bitCount(a.b3 ^ b.b3)

  test("query output equals the brute-force hamming<=3 pair set; twins recovered") {
    import spark.implicits._
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.length($"text") > 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // replay the query's corpus: original + one-byte-perturbed re-encode
    val hashes = texts.flatMap { case (id, t) =>
      val variant = t.take(t.length / 2) + "q" + t.drop(t.length / 2 + 1)
      Seq(operators.Multimodal.phashOf(2 * id, t.getBytes("UTF-8")),
        operators.Multimodal.phashOf(2 * id + 1, variant.getBytes("UTF-8")))
    }
    val brute = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      (a, b) = (hashes(i), hashes(j))
      if ham(a, b) <= 3
    } yield {
      val (x, y) = if (a.doc_id < b.doc_id) (a, b) else (b, a)
      (x.doc_id, y.doc_id, ham(a, b))
    }).toSet
    val got = SparkEntry.queries("q_multimodal_phash")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, "banded LSH must be lossless at hamming <= 3")
    val twins = got.count { case (a, b, _) => b == a + 1 && a % 2 == 0 }
    assert(twins >= texts.length * 9 / 10,
      s"expected >=90% of ${texts.length} re-encode twins, got $twins")
  }
}

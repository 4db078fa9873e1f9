package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_readability (operators.TextOps): the Flesch projection matches a
  * driver-side replica and the banding is consistent with the score. */
class ReadabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("flesch score matches an exact driver-side replica; bands agree with the score") {
    import spark.implicits._
    val got = SparkEntry.queries("q_readability")(spark, dir)
      .as[(Long, Long, Long, Long, Double, String)].collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.length == docs.size)
    got.foreach { case (id, nWords, nSyl, nSent, flesch, band) =>
      val text = docs(id)
      val words = text.split(" ", -1).length
      val syl = "[aeiouy]+".r.findAllIn(text.toLowerCase).length
      val sent = math.max("[.!?]+".r.findAllIn(text).length, 1)
      assert(nWords == words && nSyl == syl && nSent == sent)
      val expect = math.floor((206.835 - 1.015 * (words.toDouble / sent)
        - 84.6 * (syl.toDouble / words)) * 1e6 + 0.5) / 1e6
      assert(flesch == expect, s"doc $id")
      val expectBand =
        if (flesch >= 60.0) "easy" else if (flesch >= 30.0) "medium" else "hard"
      assert(band == expectBand)
    }
    // the corpus is not degenerate: scores spread across values
    assert(got.map(_._5).distinct.length > 1)
  }
}

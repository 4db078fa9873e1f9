package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_dsir laws (operators.TextOps): the importance weights must
  * actually separate the target domain — that's the entire point of
  * DSIR — and the top-20% cut must be an exact order statistic. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("target-domain docs score higher; the 20% cut is exact with ties kept") {
    import spark.implicits._
    val out = SparkEntry.queries("q_dsir")(spark, dir)
      .as[(Long, Long, Double, Long)].collect()
    val langs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    assert(out.length == langs.size, "one weight row per document")

    // separation: mean log-ratio of target (en) docs must exceed the
    // rest — the hashed LMs must carry the domain signal through the
    // bucketing
    val (en, other) = out.partition(r => langs(r._1) == "en")
    def mean(v: Seq[Double]) = v.sum / v.size
    assert(mean(en.map(_._3).toSeq) > mean(other.map(_._3).toSeq),
      "en docs must out-score non-en on the importance ratio")
    // and the cut should be dominated by target docs
    val sel = out.filter(_._4 == 1L)
    assert(sel.count(r => langs(r._1) == "en").toDouble / sel.length > 0.5,
      "the selected set should be majority target-domain")

    // exact order-statistic cut: selected == all docs with weight >= the
    // ceil(4n/5)-ranked weight (ties INCLUDED, so >= 20% selected)
    val n = out.length
    val sorted = out.map(_._3).sorted
    val t = sorted((n * 4 + 4) / 5 - 1)
    out.foreach { case (id, _, w, s) =>
      assert((s == 1L) == (w >= t), s"doc $id: w=$w t=$t selected=$s")
    }
    assert(sel.length >= n / 5, "at least 20% must survive the cut")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_hard_negatives laws (operators.Similarity): every mined negative
  * must genuinely be a NEGATIVE (label differs from its anchor's), the
  * per-anchor ranking must be the exact similarity order, and the mined
  * set must agree with a brute-force replay. */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("top-5 different-label neighbors, exactly ranked, match brute force") {
    import spark.implicits._
    val out = SparkEntry.queries("q_hard_negatives")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Long, Array[Float])].collect()
      .map { case (id, l, e) => id -> (l, e.map(_.toDouble)) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def round6(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0

    out.groupBy(_._1).foreach { case (qid, rows) =>
      val (qlabel, qe) = vecs(qid)
      // labels differ, anchors' labels echoed correctly
      rows.foreach { case (_, ql, _, cid, cl, _) =>
        assert(ql == qlabel && cl == vecs(cid)._1 && cl != ql,
          s"anchor $qid: non-negative or mislabeled row")
      }
      // exact brute-force top-5 by (sim desc, cid)
      val want = vecs.toSeq
        .filter { case (_, (l, _)) => l != qlabel }
        .map { case (cid, (_, ce)) => (cid, round6(cos(qe, ce))) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(5)
      val got = rows.sortBy(_._3).map(r => (r._4, r._6)).toSeq
      assert(got == want, s"anchor $qid: $got vs $want")
    }
    assert(out.map(_._1).distinct.length ==
      vecs.keys.count(_ % 100 == 0), "every anchor mined")
  }
}

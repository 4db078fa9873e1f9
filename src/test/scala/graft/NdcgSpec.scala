package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_ndcg laws (operators.MlOps): the gain table IS the log₂ DCG
  * schedule on the 1e-6 grid, and the declared query agrees exactly
  * with a plain-Scala brute-force replay of the metric at sf0.001. */
class NdcgSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("gain table is floor(1e6/log2(rn+1)+0.5), strictly decreasing; prefix sums match") {
    val gains = graft.operators.MlOps.NdcgGains
    assert(gains.length == graft.operators.MlOps.NdcgK)
    gains.zipWithIndex.foreach { case (g, i) =>
      val rn = i + 1
      assert(g == math.floor(1e6 / (math.log(rn + 1.0) / math.log(2.0))
        + 0.5).toLong, s"gain at rank $rn")
    }
    assert(gains.head == 1000000L, "rank 1 gain is exactly 1")
    assert(gains == gains.sorted.reverse, "gains must decrease with rank")
    assert(graft.operators.MlOps.NdcgPrefix ==
      gains.scanLeft(0L)(_ + _).tail)
  }

  test("exact match against a brute-force replay; ndcg in [0,1]") {
    import spark.implicits._
    val out = SparkEntry.queries("q_ndcg")(spark, dir)
      .as[(Long, Long, Long, Double, Option[Double])].collect()
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

    val k = graft.operators.MlOps.NdcgK
    val gains = graft.operators.MlOps.NdcgGains
    val prefix = graft.operators.MlOps.NdcgPrefix
    val anchors = vecs.keys.filter(_ % 20 == 0).toSeq.sorted
    assert(out.map(_._1).toSeq.sorted == anchors, "one row per anchor")

    val byQid = out.map(r => r._1 -> r).toMap
    anchors.foreach { qid =>
      val (qlabel, qe) = vecs(qid)
      val top = vecs.toSeq.filter(_._1 != qid)
        .map { case (cid, (cl, ce)) => (cid, cl, round6(cos(qe, ce))) }
        .sortBy { case (cid, _, s) => (-s, cid) }
        .take(k)
      val qdcg = top.zipWithIndex.collect {
        case ((_, cl, _), i) if cl == qlabel => gains(i) }.sum
      val nRel = vecs.values.count(_._1 == qlabel) - 1
      val m = math.min(nRel, k)
      val want = (qid, qlabel, nRel.toLong, qdcg / 1e6,
        if (m > 0) Some(round6(qdcg.toDouble / prefix(m - 1))) else None)
      assert(byQid(qid) == want, s"anchor $qid: ${byQid(qid)} vs $want")
      byQid(qid)._5.foreach(v => assert(v >= 0.0 && v <= 1.0,
        s"anchor $qid: ndcg $v out of [0,1]"))
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_random_projection laws (operators.Similarity): the projection is
  * an exact signed-integer matrix multiply reproducible in plain
  * Scala, and the JL distortion ratio concentrates around 1 — the
  * property the operator exists to deliver. */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir
  private val d2 = 16

  private def md5first(s: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8"))(0) & 0xff
  }
  private def sgn(i: Int, j: Int): Long =
    if (md5first(s"${i}_$j") < 0x80) 1L else -1L

  test("exact match against a plain-Scala replica; ratio concentrates near 1") {
    import spark.implicits._
    val out = SparkEntry.queries("q_random_projection")(spark, dir)
      .as[(Long, String, Option[Double])].collect()
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    assert(out.length == vecs.size, "one row per vector")
    def round6(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    out.foreach { case (vid, proj, ratio) =>
      val qx = vecs(vid).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      val y = (0 until d2).map(j =>
        qx.indices.map(i => sgn(i, j) * qx(i)).sum)
      assert(proj == y.mkString(","), s"vec $vid projection")
      val nx2 = qx.map(v => v * v).sum
      val sy2 = y.map(v => v * v).sum
      assert(ratio.contains(round6(sy2.toDouble / (d2.toDouble * nx2))),
        s"vec $vid ratio")
    }
    // JL concentration: E[ratio] = 1 exactly under Rademacher signs;
    // per-vector sd is ~sqrt(2/d2) ≈ 0.35, so the corpus mean of ~200
    // iid-ish ratios should sit within a few sd/sqrt(n) of 1.
    val ratios = out.flatMap(_._3)
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15,
      s"mean JL ratio $mean drifted from 1")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      "individual distortions within loose JL bounds at d'=16")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_semdedup laws (operators.Similarity): output shape invariants and
  * brute-force agreement of the within-cell greedy keep-first rule.
  * The k-means cell assignment itself is pinned by the IVF oracle
  * family; here we take the query's own cells as given and re-derive
  * the dedup decision per vector in plain Scala. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("one row per vector; kept <=> no smaller similar cell-mate; threshold exercised") {
    import spark.implicits._
    val out = SparkEntry.queries("q_semdedup")(spark, dir)
      .as[(Long, Long, Long, Option[Double], Long)].collect()
    val nVecs = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(out.length == nVecs, "one decision row per vector")
    out.foreach { case (_, _, nDup, maxSim, kept) =>
      assert((kept == 1L) == (nDup == 0L))
      assert((nDup == 0L) == maxSim.isEmpty)
      maxSim.foreach(s => assert(s >= 0.30))
    }
    assert(out.exists(_._5 == 0L), "threshold must drop something")
    assert(out.exists(_._5 == 1L), "threshold must keep something")
    // the smallest id of every cell can have no smaller cell-mate
    out.groupBy(_._2).foreach { case (cell, rows) =>
      val first = rows.minBy(_._1)
      assert(first._5 == 1L, s"cell $cell: smallest id ${first._1} not kept")
    }
  }

  test("dup counts match a brute-force replay of the greedy rule per cell") {
    import spark.implicits._
    val out = SparkEntry.queries("q_semdedup")(spark, dir)
      .as[(Long, Long, Long, Option[Double], Long)].collect()
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
    // the native cosine's exact arithmetic: three left-to-right folds
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.keys.map { b =>
      val sims = for {
        a <- vecs.keys if a < b && cellOf(a) == cellOf(b)
        s = round6(cos(vecs(a), vecs(b))) if s >= 0.30
      } yield s
      b -> (sims.size.toLong, if (sims.isEmpty) None else Some(sims.max))
    }.toMap
    out.foreach { case (id, _, nDup, maxSim, _) =>
      assert(want(id)._1 == nDup, s"vec $id: nDup $nDup vs ${want(id)._1}")
      assert(want(id)._2 == maxSim, s"vec $id: maxSim $maxSim vs ${want(id)._2}")
    }
  }
}

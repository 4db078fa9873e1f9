package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Direct semantics of the DataFrame Pregel connected components (the
  * declared q_dedup_clusters is oracle-checked end-to-end; this pins the
  * algorithm on a hand-built graph: multi-round convergence on a chain
  * deeper than one propagation hop, component separation, and the
  * min-id labeling contract). */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("chain, triangle and pair resolve to min-id components") {
    import spark.implicits._
    // component A: chain 1-2-3-4-5 (diameter 4 → needs >1 round)
    // component B: triangle 10-11-12 plus pendant 13
    // component C: pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L),
      (20L, 21L)).toDF("a", "b")
    val got = Similarity.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("edge direction does not matter (labels flow against edge order)") {
    import spark.implicits._
    // min id sits at the "far" end of every declared pair
    val pairs = Seq((5L, 1L), (4L, 5L), (3L, 4L)).toDF("a", "b")
    val got = Similarity.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }
}

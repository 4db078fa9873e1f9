package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation-operator invariants on sf0.001. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("splits are exhaustive, disjoint, and stable across runs") {
    import spark.implicits._
    val s1 = q("q_split_assign").as[(Long, String)].collect().toMap
    val s2 = q("q_split_assign").as[(Long, String)].collect().toMap
    assert(s1 == s2)
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(s1.size == total)
    val frac = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(frac("train") > frac("val") && frac("train") > frac("test"))
  }

  test("sample is a subset of train+val+test universe with bucket < 10") {
    import spark.implicits._
    val rows = q("q_sample_hash").as[(Long, String, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._3 < 10))
  }

  test("weighted mix duplicates exactly the en documents") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val nEn = docs.filter($"lang" === "en").count()
    val n = docs.count()
    assert(q("q_mix_weighted").count() == n + nEn)
  }

  test("chunking covers every token with stride-24 starts and <=32-token chunks") {
    import spark.implicits._
    val chunks = q("q_chunk_docs")
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    val nToks = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", expr("size(split(text, ' '))").cast("long"))
      .as[(Long, Long)].collect().toMap
    chunks.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 == 1)
      assert(sorted.forall(_._4 <= 32))
      sorted.sliding(2).foreach {
        case Array(p, c) => assert(c._2 == p._2 + 24)
        case _ =>
      }
      // the final chunk reaches the end of the document
      val last = sorted.last
      assert(last._2 + last._4 - 1 == nToks(docId))
      // total distinct covered positions == document length
      val covered = sorted.flatMap(c => c._2 until (c._2 + c._4)).distinct
      assert(covered.length == nToks(docId).toInt)
    }
  }

  test("pack bins: cumulative sums are per-source monotone and bins ordered") {
    import spark.implicits._
    val rows = q("q_pack_bins")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    rows.values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      // cum_tokens strictly increasing, bin non-decreasing, and each
      // cum is previous cum + n_tokens
      sorted.sliding(2).foreach {
        case Array(p, c) =>
          assert(c._4 == p._4 + c._3)
          assert(c._5 >= p._5)
        case _ =>
      }
      assert(sorted.head._4 == sorted.head._3)
    }
  }
}

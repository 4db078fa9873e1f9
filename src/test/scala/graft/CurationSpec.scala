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

  test("weighted sample picks exactly the 50 smallest priority keys") {
    import spark.implicits._
    val got = q("q_sample_weighted")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 50)
    // brute-force replay of the Efraimidis–Spirakis keys over all docs
    val all = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)]
      .collect()
    val keys = all.filter(_._3 > 0).map { case (id, text, w) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((text + "|ws").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / math.pow(2, 52)
      val pq = math.floor(-math.log(u) / w * 1e9 + 0.5).toLong
      (pq, id)
    }.sorted.take(50)
    assert(got.map(r => (math.round(r._3 * 1e9), r._1)).toSeq == keys.toSeq,
      "sample must be the true 50 smallest keys (ties by doc_id)")
    // weighting sanity: the sample's mean weight exceeds the corpus mean
    // (longer docs are proportionally more likely to be drawn)
    val meanAll = all.map(_._3).sum.toDouble / all.length
    val meanGot = got.map(_._2).sum.toDouble / got.length
    assert(meanGot > meanAll * 1.05,
      s"weighted sample mean $meanGot should exceed corpus mean $meanAll")
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

  test("temperature mix: exact replica; flattens the distribution toward uniform") {
    import spark.implicits._
    val got = SparkEntry.queries("q_temperature_mix")(spark, dir)
      .as[(String, Long, Double, Double, Double, Long)].collect().toSeq
    val counts = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val nTot = counts.values.sum
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val qpow = counts.view.mapValues(n =>
      math.floor(math.pow(n.toDouble / nTot, 0.3) * 1e6 + 0.5).toLong)
      .toMap
    val z = qpow.values.sum
    val expect = counts.keys.toSeq.sorted.map { l =>
      (l, counts(l), r6(counts(l).toDouble / nTot),
        r6(qpow(l).toDouble / z),
        r6((qpow(l).toDouble * nTot) / (z.toDouble * counts(l))),
        1000000L * qpow(l) / z)
    }
    assert(got == expect, s"got $got\nexpect $expect")
    // temperature at alpha<1 flattens: rare langs upsample, the head
    // downsamples, and the q ordering preserves the p ordering
    val byP = got.sortBy(_._3)
    assert(byP.head._5 > 1.0 - 1e-6 || got.map(_._3).distinct.size == 1,
      "the rarest language must not be downsampled")
    assert(byP.last._5 <= 1.0 + 1e-6,
      "the head language must not be upsampled")
    assert(byP.map(_._4) == byP.map(_._4).sorted,
      "q must preserve the p ordering")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4, "q shares sum to 1")
    assert(got.map(_._6).sum <= 1000000L, "budget never over-allocates")
  }

  test("weak supervision: exact LF replica; label is the majority sign, ties abstain") {
    import spark.implicits._
    val got = SparkEntry.queries("q_weak_supervision")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    val docsT = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)].collect()
    assert(got.size == docsT.size, "one row per document")
    val expect = docsT.toSeq.sortBy(_._1).map { case (id, text, nChars) =>
      val toks = text.toLowerCase.split(" ", -1).toSeq
      val lf1 = if (nChars > 400) 1L else if (nChars < 50) -1L else 0L
      val lf2 = if (toks.exists(Set("the", "of", "and"))) 1L else 0L
      val digits = text.count(_.isDigit)
      val lf3 = if (digits * 10 > text.length * 3) -1L else 0L
      val lf4 = if (toks.distinct.size * 2 < toks.size) -1L else 0L
      val s = lf1 + lf2 + lf3 + lf4
      (id, lf1, lf2, lf3, lf4,
        math.abs(lf1) + math.abs(lf2) + math.abs(lf3) + math.abs(lf4),
        if (s > 0) Some(1L) else if (s < 0) Some(-1L) else None)
    }
    assert(got == expect, s"first diff: ${
      got.zip(expect).find(p => p._1 != p._2)}")
    assert(got.exists(_._7.contains(1L)) && got.exists(_._7.isEmpty),
      "the corpus must exercise both labeled and abstained outcomes")
  }

  test("gdpr delete: cascade counts reconcile exactly across the three tables") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def deleted(k: Long): Boolean =
      ((md.digest(k.toString.getBytes("UTF-8"))(0) & 0xf0) >> 4) == 0
    val got = SparkEntry.queries("q_gdpr_delete")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def check(table: String, key: String, name: String): Unit = {
      val ks = graft.sources.Tables.load(spark, dir, table)
        .select(org.apache.spark.sql.functions.col(key).cast("long"))
        .as[Long].collect()
      val nDel = ks.count(deleted).toLong
      val (_, nb, nd, na, f) = got(name)
      assert((nb, nd, na) == (ks.length.toLong, nDel, ks.length - nDel),
        s"$name counts")
      assert(f == r6(nDel.toDouble / ks.length), s"$name fraction")
    }
    check("customer", "c_custkey", "customer")
    check("orders", "o_custkey", "orders")
    check("events", "user_id", "events")
    assert(got("customer")._3 > 0, "the deletion list must be non-empty")
  }
}

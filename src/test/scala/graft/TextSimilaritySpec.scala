package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Text/similarity operator laws (SURVEY.md §5.2.3): dedup idempotence,
  * cosine symmetry/bounds, Jaccard bounds — checked column-wise over one
  * generated DataFrame (fast) rather than one job per sample. */
class TextSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("exact dedup is idempotent and keeps the smallest doc_id per text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y"), (4L, "x y"), (5L, "solo"))
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2($"text", 256)).orderBy($"doc_id")
    def dedup(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    val once = dedup(docs)
    assert(once.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
    assert(dedup(once).count() == once.count())
  }

  test("cosine similarity is symmetric, bounded, and 1 on self") {
    import spark.implicits._
    val vecs = Gen.listOfN(16,
        Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toArray))
      .sample.get.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "e")
    def dot(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val pairs = df.select($"id".as("ai"), $"e".as("a"))
      .crossJoin(df.select($"id".as("bi"), $"e".as("b")))
      .select($"ai", $"bi",
        (dot("a", "b") / (sqrt(dot("a", "a")) * sqrt(dot("b", "b")))).as("sim"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.foreach { case ((a, b), s) =>
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
      assert(math.abs(s - pairs((b, a))) < 1e-12, s"asym at ($a,$b)")
      if (a == b) assert(math.abs(s - 1.0) < 1e-9)
    }
  }

  test("embed coherence equals a driver-side exact-centroid replica") {
    import spark.implicits._
    // replay the quantize->BIGINT-sum->one-division centroid and the
    // left-to-right cosine fold in plain Scala and demand bit equality
    val raw = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val cents = raw.groupBy(_._2).map { case (label, g) =>
      val d = g.head._3.length
      val ce = Array.tabulate(d) { i =>
        val sv = g.map(v => math.floor(v._3(i) * 10000.0 + 0.5).toLong).sum
        sv.toDouble / (g.size * 10000.0)
      }
      label -> ce
    }
    def fold(a: Array[Double], b: Array[Double]): Double = {
      var (dot, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = raw.map { case (id, label, e) =>
      id -> math.floor(fold(e, cents(label)) * 1000000.0 + 0.5) / 1000000.0
    }.toMap
    val got = SparkEntry.queries("q_embed_coherence")(spark, dir)
      .as[(Long, Int, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, _, c) =>
      assert(c == expected(id), s"coherence mismatch for vec $id")
    }
  }

  test("shingle Jaccard is 1 for identical docs and in [0,1] for all pairs") {
    import spark.implicits._
    val out = SparkEntry.queries("q_dedup_near")(spark, dir)
    val sims = out.select($"jaccard").as[Double].collect()
    assert(sims.forall(j => j >= 0.6 && j <= 1.0))
  }

  test("containment pairs equal the brute-force all-pairs replica") {
    import spark.implicits._
    val got = SparkEntry.queries("q_dedup_containment")(spark, dir)
      .select($"a", $"b", $"containment").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // naive replica over raw text: distinct 3-shingles, same md5-fold
    // hash domain is irrelevant for SET ratios — plain strings suffice
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect()
    def sh(text: String): Set[String] = {
      val t = text.toLowerCase.split(" ", -1)
      if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
      else Set(text.toLowerCase)
    }
    val bySource = docs.groupBy(_._2)
    val want = bySource.values.iterator.flatMap { ds =>
      for {
        a <- ds.iterator; b <- ds.iterator if a._1 != b._1
        sa = sh(a._3)
        cr = math.floor(sa.intersect(sh(b._3)).size.toDouble / sa.size
          * 1000000.0 + 0.5) / 1000000.0
        if cr >= 0.8
      } yield (a._1, b._1) -> cr
    }.toMap
    assert(got == want, "containment must match the naive all-pairs form")
    assert(got.nonEmpty && got.values.forall(c => c >= 0.8 && c <= 1.0))
  }

  test("sorted-neighborhood pairs are true near-dups found by the window pairing") {
    import spark.implicits._
    val got = SparkEntry.queries("q_dedup_sorted_nbhd")(spark, dir)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect()
    assert(got.nonEmpty && got.forall { case (a, b, j) =>
      a < b && j >= 0.6 && j <= 1.0 })
    // every reported pair must also be in the exhaustive truth set with
    // the identical jaccard (SNM trades recall, never precision)
    val truth = SparkEntry.queries("q_dedup_near")(spark, dir)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (a, b, j) =>
      assert(truth.get((a, b)).contains(j), s"($a,$b) not in truth or sim drifted") }
    // window-pairing replica: candidates are exactly rank-distance <= 5
    // within (source, 3-smallest-token key) order
    val keyed = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect()
      .map { case (id, src, txt) =>
        val key = txt.toLowerCase.split(" ", -1).distinct.sorted.take(3)
          .mkString(" ")
        (id, src, key)
      }
    val cand = keyed.groupBy(_._2).values.flatMap { ds =>
      val ord = ds.sortBy(d => (d._3, d._1)).map(_._1)
      for {
        i <- ord.indices; k <- 1 to 5 if i + k < ord.length
        p = (math.min(ord(i), ord(i + k)), math.max(ord(i), ord(i + k)))
      } yield p
    }.toSet
    got.foreach { case (a, b, _) =>
      assert(cand((a, b)), s"($a,$b) outside the W=5 neighborhood") }
  }

  test("chi2 select: scores match an exact contingency replica, top-5 per lang") {
    import spark.implicits._
    val got = SparkEntry.queries("q_chi2_select")(spark, dir)
      .as[(String, Long, String, Long, Long, Double)].collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
      .map { case (l, t) => (l, t.toLowerCase.split(" ", -1).distinct.toSet) }
    val n = docs.length.toLong
    val nc = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cell = docs.flatMap { case (l, ts) => ts.map(t => (l, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfT = cell.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def chi2(l: String, t: String): Double = {
      val n11 = cell((l, t)); val df = dfT(t); val c = nc(l)
      val diff = (n11 * (n - df - c + n11) - (df - n11) * (c - n11)).toDouble
      val x = (n.toDouble * diff * diff) /
        (df.toDouble * (n - df).toDouble * c.toDouble * (n - c).toDouble)
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    }
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1L to 5L), s"$lang ranks")
      rows.foreach { case (_, _, tok, n11, df, sc) =>
        assert(n11 == cell((lang, tok)) && df == dfT(tok), s"$lang/$tok counts")
        assert(sc == chi2(lang, tok), s"$lang/$tok score")
      }
      // the reported 5 really are the arg-top-5 under (chi2 desc, token)
      val best = dfT.keys.filter(t => cell.contains((lang, t)) && dfT(t) < n)
        .toSeq.map(t => (t, chi2(lang, t)))
        .sortBy { case (t, s) => (-s, t) }.take(5).map(_._1)
      assert(rows.sortBy(_._2).map(_._3).sameElements(best), s"$lang top-5")
    }
  }

  test("mi select: scores match an exact quantized-MI replica, top-5 per lang") {
    import spark.implicits._
    val got = SparkEntry.queries("q_mi_select")(spark, dir)
      .as[(String, Long, String, Long, Long, Double)].collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
      .map { case (l, t) => (l, t.toLowerCase.split(" ", -1).distinct.toSet) }
    val n = docs.length.toLong
    val nc = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cell = docs.flatMap { case (l, ts) => ts.map(t => (l, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfT = cell.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def term(nCell: Long, rowm: Long, colm: Long): Long =
      if (nCell <= 0) 0L
      else nCell * math.floor(math.log(
        (nCell.toDouble * n) / (rowm.toDouble * colm)) * 1e6 + 0.5).toLong
    def miQ(l: String, t: String): Long = {
      val n11 = cell((l, t)); val df = dfT(t); val c = nc(l)
      term(n11, df, c) + term(df - n11, df, n - c) +
        term(c - n11, n - df, c) + term(n - df - c + n11, n - df, n - c)
    }
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1L to 5L), s"$lang ranks")
      rows.foreach { case (_, _, tok, n11, df, mi) =>
        assert(n11 == cell((lang, tok)) && df == dfT(tok), s"$lang/$tok counts")
        assert(mi == miQ(lang, tok).toDouble / (n.toDouble * 1e6),
          s"$lang/$tok score")
        assert(mi > -1e-4, s"$lang/$tok: MI materially negative ($mi)")
      }
      // the reported 5 really are the arg-top-5 under (mi_q desc, token)
      val best = dfT.keys.filter(t => cell.contains((lang, t)) && dfT(t) < n)
        .toSeq.map(t => (t, miQ(lang, t)))
        .sortBy { case (t, s) => (-s, t) }.take(5).map(_._1)
      assert(rows.sortBy(_._2).map(_._3).sameElements(best), s"$lang top-5")
    }
  }

  test("rank fusion: exact match against a plain-Scala RRF replica") {
    import spark.implicits._
    val terms = Seq("spark", "vector", "dup")
    val docsT = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.toLowerCase.split(" ", -1).toSeq) }
    val n = docsT.length.toLong
    val tf = docsT.map { case (id, toks) =>
      id -> terms.map(t => toks.count(_ == t).toLong) }.toMap
    val dl = docsT.map { case (id, toks) => id -> toks.length.toLong }.toMap
    val df = terms.indices.map(i => tf.values.count(_(i) > 0).toLong)
    val avgdl = dl.values.sum.toDouble / n
    def qsBm25(id: Long): Long = terms.indices.map { i =>
      val t = tf(id)(i)
      if (t == 0) 0L
      else {
        val idf = math.log(1.0 + (n.toDouble - df(i) + 0.5) / (df(i) + 0.5))
        val norm = t * 2.2 / (t + 1.2 * (0.25 + 0.75 * (dl(id) / avgdl)))
        math.floor(idf * norm * 1e6 + 0.5).toLong
      }
    }.sum
    def qb(id: Long): Long = terms.indices.map { i =>
      tf(id)(i) * math.floor(math.log(n.toDouble / df(i)) * 1e6 + 0.5).toLong
    }.sum
    def top100(score: Long => Long): Seq[(Long, Long)] =
      tf.keys.toSeq.map(id => (id, score(id))).filter(_._2 > 0)
        .sortBy { case (id, s) => (-s, id) }.take(100)
        .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
    val ra = top100(qsBm25).toMap
    val rb = top100(qb).toMap
    def rrf(r: Option[Long]): Long = r.map(x =>
      (2000000000L + (60 + x)) / (2 * (60 + x))).getOrElse(0L)
    val expect = (ra.keySet ++ rb.keySet).toSeq
      .map(id => (id, ra.get(id), rb.get(id),
        rrf(ra.get(id)) + rrf(rb.get(id))))
      .sortBy { case (id, _, _, q) => (-q, id) }.take(20)
      .map { case (id, a, b, q) => (id, a, b, q / 1e9) }
    val got = SparkEntry.queries("q_rank_fusion")(spark, dir)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    assert(got == expect, s"got ${got.take(5)}...\nexpect ${expect.take(5)}...")
  }

  test("minhash-LSH candidates are a superset of high-jaccard pairs it reports") {
    import spark.implicits._
    val lsh = SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(lsh.forall { case (a, b, j) => a < b && j >= 0.6 })
  }

  test("similarity top-k ranks are dense from 1 and sims non-increasing per query") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_similarity_topk")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).values
    rows.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._4 >= y._4
        case _ => true
      })
    }
  }

  test("fingerprint equals the Scala fold replica") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().take(20)
    val got = SparkEntry.queries("q_fingerprint")(spark, dir)
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      val want = text.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007)
      assert(got(id) == want, s"doc $id")
    }
  }

  test("repetition metrics obey their structural laws against token counts") {
    import spark.implicits._
    val rep = SparkEntry.queries("q_quality_repetition")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    val nTok = SparkEntry.queries("q_token_count")(spark, dir)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(rep.nonEmpty)
    rep.foreach { case (id, nBi, nDist, topN, dupF, topF) =>
      assert(nBi == nTok(id) - 1, s"doc $id: bigrams != tokens-1")
      assert(nDist >= 1 && nDist <= nBi && topN >= 1 && topN <= nBi)
      assert(dupF >= 0.0 && dupF < 1.0 && topF > 0.0 && topF <= 1.0)
      // max count ≥ mean count, in exact integer form (round6 on the
      // fractions would make the double comparison a tolerance game)
      assert(topN * nDist >= nBi, s"doc $id: argmax below mean")
    }
  }

  test("collocations match a driver-side PMI replica token for token") {
    import spark.implicits._
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select(lower($"text")).as[String].collect()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    var nBi = 0L
    texts.foreach { t =>
      val toks = t.split(" ", -1)
      toks.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        bi((p(0), p(1))) = bi.getOrElse((p(0), p(1)), 0L) + 1; nBi += 1
      }
    }
    val nUni = uni.values.sum
    def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = bi.toSeq.collect { case ((a, b), c) if c >= 3 =>
      (a, b, c, round6(math.log(
        (c.toDouble * nUni * nUni) / (nBi.toDouble * uni(a) * uni(b)))))
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(20)
    val got = SparkEntry.queries("q_collocations")(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == want, "engine top-20 PMI differs from the replica")
  }

  test("substring dedup finds exactly the >=15-token shared runs, with true lengths") {
    import spark.implicits._
    // fixture corpus with KNOWN shared runs (all tokens otherwise unique,
    // so no chance 8-gram collisions): written as a documents.parquet so
    // the DECLARED query runs over it unchanged
    def toks(p: String, r: Range) = r.map(i => s"$p$i").mkString(" ")
    val d1 = toks("w", 0 until 60)
    val d2 = toks("x", 0 until 20) + " " + toks("w", 10 until 30) + " " +
      toks("y", 0 until 20) // shares w10..w29 with d1: run = 20
    val d3 = toks("z", 0 until 10) + " " + toks("w", 30 until 44) + " " +
      toks("z", 10 until 20) // shares only a 14-run with d1: BELOW cut
    val d4 = toks("u", 0 until 40) // unrelated
    val d5 = d1 // exact duplicate: run = 60 with d1, 20 with d2
    val fixDir = "/tmp/graft_substr_fixture"
    Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, d5))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val got = SparkEntry.queries("q_substring_dedup")(spark, fixDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 20L), (1L, 5L, 60L), (2L, 5L, 20L)),
      s"expected exact run pairs, got $got")
  }

  test("token entropy matches the exact-quantized Scala replica") {
    import spark.implicits._
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = texts.map { case (id, t) =>
      val counts = t.split(" ", -1).groupBy(identity).values.map(_.length.toLong)
      val n = counts.sum
      val sq = counts.map(c =>
        math.floor(c.toDouble * math.log(c.toDouble) * 1e6 + 0.5).toLong).sum
      (id, n, round6(math.log(n.toDouble) - (sq.toDouble / 1e6) / n))
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_token_entropy")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, "engine entropy differs from the replica")
  }

  test("bigram cross-entropy matches the exact-quantized Scala replica") {
    import spark.implicits._
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    val perDoc = texts.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      if (toks.length < 2) Nil
      else toks.sliding(2).map(p => ((id, p(0), p(1)), 1L)).toSeq
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cab = perDoc.toSeq.groupBy { case ((_, a, b), _) => (a, b) }
      .view.mapValues(_.map(_._2).sum).toMap
    val ca = cab.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    def qnll(a: String, b: String) = math.floor(
      math.log(ca(a).toDouble / cab((a, b))) * 1e6 + 0.5).toLong
    val want = perDoc.toSeq.groupBy(_._1._1).map { case (id, rows) =>
      val n = rows.map(_._2).sum
      val sq = rows.map { case ((_, a, b), c) => c * qnll(a, b) }.sum
      (id, n, sq.toDouble / (n * 1e6))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_bigram_logprob")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, "engine bigram nll differs from the replica")
  }

  test("unigram surprisal matches the exact-quantized Scala replica") {
    import spark.implicits._
    val tf = Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "b", 1L), (2L, "c", 1L))
      .toDF("doc_id", "token", "tf")
    val got = graft.operators.TextOps.unigramScored(spark, tf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def qnll(cnt: Long) = math.floor(math.log(5.0 / cnt) * 1e6 + 0.5).toLong
    assert(got(1L) == ((3L,
      (2 * qnll(2) + qnll(2)).toDouble / (3L * 1e6))))
    assert(got(2L) == ((2L, (qnll(2) + qnll(1)).toDouble / (2L * 1e6))))
  }

  test("entity resolution: clusters are the transitive closure of fuzzy pairs") {
    import spark.implicits._
    val got = SparkEntry.queries("q_entity_resolution")(spark, dir)
      .as[(Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    // brute-force replica: blocked Levenshtein pairs + union-find
    val names = graft.sources.Tables.load(spark, dir, "part")
      .groupBy($"p_name")
      .agg(min($"p_partkey").as("id"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parent = scala.collection.mutable.Map(names.map(n => n._2 -> n._2): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      Seq(a, b) <- names.groupBy(_._1.split(" ").last).values
        .flatMap(_.toSeq.sortBy(_._1).combinations(2))
      if lev(a._1, b._1) <= 3
    } {
      val (ra, rb) = (find(a._2), find(b._2))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = names.groupBy(n => find(n._2)).map { case (rep, ms) =>
      rep -> (ms.length.toLong, ms.map(_._3).sum, ms.map(_._1).min)
    }
    assert(got.map(_._1).toSet == want.keySet, "entity id set")
    got.foreach { case (id, nNames, nParts, canon) =>
      assert((nNames, nParts, canon) == want(id), s"entity $id")
    }
    assert(got.exists(_._2 > 1), "must merge at least one variant cluster")
  }

  test("vocab growth: decile volumes and first-occurrence types match brute force") {
    import spark.implicits._
    val got = SparkEntry.queries("q_vocab_growth")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (0L to 9L), "one row per decile, ordered")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    val mn = docs.map(_._1).min
    val spanw = docs.map(_._1).max - mn + 1
    val toks = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => ((id - mn) * 10 / spanw, w))
    }
    val vol = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val fresh = toks.groupBy(_._2).values.map(_.map(_._1).min)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var (cumT, cumV) = (0L, 0L)
    got.foreach { case (d, nTok, newTypes, cumTok, cumTypes) =>
      assert(nTok == vol(d), s"decile $d volume")
      assert(newTypes == fresh.getOrElse(d, 0L), s"decile $d new types")
      cumT += nTok; cumV += newTypes
      assert(cumTok == cumT && cumTypes == cumV, s"decile $d cumulative")
    }
    // Heaps sanity: cumulative types are monotone and end at the vocab size
    assert(got.last._5 == toks.map(_._2).distinct.length.toLong)
  }

  test("LLM stub summarize: plumbing, parse, and cost accumulator") {
    import spark.implicits._
    val acc = spark.sparkContext.doubleAccumulator("test_llm_cost")
    val docs = Seq((1L, "S/1", "alpha beta gamma delta"),
      (2L, "S/2", Array.fill(20)("tok").mkString(" ")))
      .toDF("id", "symbol", "text")
    val out = graft.operators.Llm
      .summarize(docs, () => new graft.operators.Llm.StubClient, 1, acc)
      .orderBy($"id").as[(Long, String, String)].collect()
    assert(out(0)._3 == "alpha beta gamma delta … (4 tokens)")
    assert(out(1)._3.endsWith("… (20 tokens)"))
    assert(acc.value > 0.0)
  }

  test("multimodal audio: PCM window framing matches hand arithmetic") {
    // 5 samples from 10 bytes, window 2: [s0 s1][s2 s3][s4]
    val bytes = Array[Byte](0x01, 0x00, // s0 = 1
      0x00, 0x7f.toByte, // s1 = 32512 (max positive high byte)
      0xff.toByte, 0xff.toByte, // s2 = -1
      0x00, 0x80.toByte, // s3 = -32768
      0x03, 0x00) // s4 = 3
    val w = graft.operators.Multimodal.pcmWindows(9L, bytes, 2)
    assert(w.map(x => (x.win_idx, x.n, x.peak, x.energy)) == Seq(
      (0L, 2L, 32512L, 1L + 32512L * 32512L),
      (1L, 2L, 32768L, 1L + 32768L * 32768L),
      (2L, 1L, 3L, 9L)))
    // odd trailing byte is dropped
    assert(graft.operators.Multimodal.pcmWindows(1L, Array[Byte](1, 0, 5), 4)
      .map(x => (x.n, x.peak)) == Seq((1L, 1L)))
  }

  test("multimodal decode features match byte arithmetic") {
    import spark.implicits._
    val docs = Seq((7L, "abc", "s")).toDF("doc_id", "text", "source")
    val media = graft.operators.Multimodal.withMediaColumn(docs)
    val f = graft.operators.Multimodal.decodeFeatures(media)
      .as[graft.operators.Multimodal.MediaFeatures].head()
    assert(f.n_bytes == 3 && f.width == 16 + 3 && f.height == 16 + 21 &&
      f.n_frames == 1 + 3)
    assert(math.abs(f.mean_byte - ('a' + 'b' + 'c') / 3.0) < 1e-12)
  }
}

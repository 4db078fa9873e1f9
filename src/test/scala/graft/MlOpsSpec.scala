package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural laws for the ML-ops module — the DuckDB gate proves
  * Spark ≡ DuckDB; these prove the statistics are RIGHT against
  * brute-force in-memory replicas at sf0.001. */
class MlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** (source, score, pos) replica of the shared scorer. */
  private def scoredRows(): Seq[(String, Double, Int)] = {
    import spark.implicits._
    graft.sources.Tables.load(spark, dir, "documents")
      .select($"source", $"text", $"lang").as[(String, String, String)]
      .collect().toSeq.map { case (src, text, lang) =>
        val letters = text.toLowerCase.count(c => c >= 'a' && c <= 'z')
        (src, r6(letters.toDouble / text.length),
          if (lang == "en") 1 else 0)
      }
  }

  test("auc: matches the O(P*N) pairwise definition per source") {
    import spark.implicits._
    val got = q("q_auc").as[(String, Long, Long, Option[Double])]
      .collect().map { case (s, p, n, a) => s -> ((p, n, a)) }.toMap
    assert(got.nonEmpty)
    scoredRows().groupBy(_._1).foreach { case (src, rows) =>
      val pos = rows.filter(_._3 == 1).map(_._2)
      val neg = rows.filter(_._3 == 0).map(_._2)
      val (gp, gn, gauc) = got(src)
      assert(gp == pos.size && gn == neg.size, s"$src counts")
      if (pos.nonEmpty && neg.nonEmpty) {
        // Pairwise: 1 for pos>neg, 1/2 for ties.
        val wins = (for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        assert(gauc.contains(r6(wins.toDouble / (2.0 * pos.size * neg.size))),
          s"$src auc")
      } else assert(gauc.isEmpty, s"$src degenerate auc must be NULL")
    }
  }

  test("calibration: bins partition the corpus; brier decomposes") {
    import spark.implicits._
    val got = q("q_calibration_bins")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val rows = scoredRows()
    assert(got.map(_._2).sum == rows.size, "bin counts partition corpus")
    assert(got.map(_._3).sum == rows.count(_._3 == 1), "positives partition")
    got.foreach { case (bin, n, nPos, meanScore, posRate, brier) =>
      val members = rows.filter(r =>
        math.min(math.floor(r._2 * 50.0), 49.0).toLong == bin)
      assert(members.size == n, s"bin $bin size")
      assert(math.abs(meanScore - members.map(_._2).sum / n) < 1e-9)
      assert(posRate == r6(nPos.toDouble / n))
      val want = members.map(r => {
        val d = r._2 - r._3
        math.floor(d * d * 1e12 + 0.5)
      }).sum / (n * 1e12)
      assert(math.abs(brier - want) < 1e-12, s"bin $bin brier")
    }
  }

  test("target encoding: leave-one-out identity per customer") {
    import spark.implicits._
    val got = q("q_target_encoding")
      .as[(Long, String, Double, Long, Double)].collect()
    assert(got.length == graft.sources.Tables
      .load(spark, dir, "customer").count())
    // Replica on the exact 1e-4 revenue grid.
    val rev = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => BigDecimal(r._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum)
      .mapValues(d => (d * 10000).toLongExact).toMap
    val segOf = got.map(r => r._1 -> r._2).toMap
    val rqOf = got.map(r => r._1 -> rev.getOrElse(r._1, 0L)).toMap
    val bySeg = rqOf.toSeq.groupBy(r => segOf(r._1))
      .view.mapValues(rs => (rs.size.toLong, rs.map(_._2).sum)).toMap
    val (gn, gsq) = (bySeg.values.map(_._1).sum, bySeg.values.map(_._2).sum)
    got.foreach { case (ck, seg, custRev, segN, enc) =>
      val (n, sq) = bySeg(seg)
      assert(segN == n, s"$ck seg_n")
      assert(custRev == rqOf(ck).toDouble / 10000.0, s"$ck rev")
      val want = r6(((sq - rqOf(ck)).toDouble / 10000.0 +
        10.0 * (gsq.toDouble / 10000.0 / gn.toDouble)) / (n - 1 + 10).toDouble)
      assert(enc == want, s"$ck enc")
    }
    // LOO really removed the row's own target: two same-segment
    // customers with different revenue must encode differently.
    val bigSeg = got.groupBy(_._2).maxBy(_._2.size)._2
    val distinctRev = bigSeg.map(_._3).distinct
    assert(distinctRev.size > 1)
    assert(bigSeg.map(_._5).distinct.size > 1,
      "LOO encodings must vary within a segment")
  }

  test("recommend: confidence ranks truthfully; top-3 cut per item") {
    import spark.implicits._
    val got = q("q_recommend_cooccur")
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    val baskets = graft.sources.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemCount = baskets.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nBaskets = baskets.size.toLong
    // Replica of the directional support counts.
    val supRep = baskets.values.toSeq.flatMap(parts =>
      for (a <- parts.toSeq; b <- parts.toSeq if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case ((a, b), s) =>
        s >= 2 && itemCount(a) >= 2 && itemCount(b) >= 2 }.toMap
    got.foreach { case (a, b, sup, conf, lift, rn) =>
      assert(supRep((a, b)) == sup, s"($a,$b) support")
      assert(conf == r6(sup.toDouble / itemCount(a)), s"($a,$b) confidence")
      assert(lift == r6(nBaskets.toDouble * sup /
        (itemCount(a).toDouble * itemCount(b))), s"($a,$b) lift")
      assert(rn >= 1 && rn <= 3)
    }
    // Per-item: emitted rows are exactly the top-3 of the full ranking.
    got.groupBy(_._1).foreach { case (a, rows) =>
      val full = supRep.collect { case ((x, b), s) if x == a =>
        (r6(s.toDouble / itemCount(a)), s, b) }.toSeq
        .sortBy { case (c, s, b) => (-c, -s, b) }
      val want = full.take(3).map(_._3)
      assert(rows.sortBy(_._6).map(_._2).toSeq == want, s"item $a top-3")
    }
  }

  test("naive bayes: argmax matches an in-memory trained replica") {
    import spark.implicits._
    val got = q("q_naive_bayes")
      .as[(Long, String, String, Double, Boolean)].collect()
    val docsRows = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect()
    assert(got.length == docsRows.length)
    val tf = docsRows.map { case (id, lang, text) =>
      (id, lang, text.toLowerCase.split(" ", -1).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val cells = tf.flatMap { case (_, lang, m) =>
      m.map { case (t, c) => ((lang, t), c) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val langTot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = cells.keySet.map(_._2).size.toLong
    val nd = docsRows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ndAll = docsRows.length.toLong
    def q6ln(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val langs = nd.keySet.toSeq.sorted
    val predicted = tf.map { case (id, _, m) =>
      val scores = langs.map { l =>
        val s = q6ln(nd(l).toDouble / ndAll) + m.map { case (t, c) =>
          c * cells.get((l, t)).map(cc =>
            q6ln((cc + 1).toDouble / (langTot(l) + v)))
            .getOrElse(q6ln(1.0 / (langTot(l) + v)))
        }.sum
        (l, s)
      }
      id -> scores.maxBy { case (l, s) => (s, -langs.indexOf(l)) }
    }.toMap
    got.foreach { case (id, langTrue, langPred, logPost, correct) =>
      val (wantLang, wantQ) = predicted(id)
      assert(langPred == wantLang, s"doc $id prediction")
      assert(logPost == wantQ.toDouble / 1e6, s"doc $id score")
      assert(correct == (langPred == langTrue))
    }
  }

  test("pca power: matches an in-memory replica; unit norm; dominant") {
    import spark.implicits._
    val got = q("q_pca_power").as[(Int, Double, Double)].collect()
    assert(got.length == 64)
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().sortBy(_._1).map(_._2)
    val d = 64
    val xq = emb.map(_.map(x => math.floor(x.toDouble * 10000.0 + 0.5)))
    val n = xq.length
    val mu = (0 until d).map(i => xq.map(_(i)).sum / (n * 10000.0))
    val spq = Array.ofDim[Long](d, d)
    xq.foreach { r =>
      val c = (0 until d).map(i => r(i) / 10000.0 - mu(i))
      for (i <- 0 until d; j <- 0 until d)
        spq(i)(j) += math.floor(c(i) * c(j) * 1e8 + 0.5).toLong
    }
    val cov = Array.tabulate(d, d)((i, j) => spq(i)(j) / (1e8 * (n - 1)))
    def step(v: IndexedSeq[Double]): (IndexedSeq[Double], Double) = {
      val sq = (0 until d).map(i =>
        (0 until d).map(j =>
          math.floor(cov(i)(j) * v(j) * 1e12 + 0.5).toLong).sum)
      val w = sq.map(_.toDouble / 1e12)
      val nrm = math.sqrt(
        w.map(x => math.floor(x * x * 1e12 + 0.5).toLong).sum / 1e12)
      (w.map(x => r6(x / nrm)), nrm)
    }
    var v: IndexedSeq[Double] = IndexedSeq.fill(d)(0.125)
    var nrm = 0.0
    for (_ <- 1 to 3) { val (nv, nn) = step(v); v = nv; nrm = nn }
    val sg = v.map(x => math.floor(x * 1e6).toLong).sum
    val want = if (sg < 0) v.map(x => r6(-x)) else v
    got.foreach { case (pos, loading, eig) =>
      assert(loading == want(pos), s"pos $pos")
      assert(eig == r6(nrm))
    }
    // Unit vector (up to grid rounding) and canonical sign.
    val norm2 = got.map(r => r._2 * r._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"norm² $norm2")
    assert(got.map(r => math.floor(r._2 * 1e6).toLong).sum >= 0)
    // Dominance: Rayleigh quotient of the found direction must beat a
    // coordinate axis's by a fair margin.
    def rayleigh(u: IndexedSeq[Double]) = {
      val cu = (0 until d).map(i => (0 until d).map(j =>
        cov(i)(j) * u(j)).sum)
      (0 until d).map(i => u(i) * cu(i)).sum /
        u.map(x => x * x).sum
    }
    val axis = IndexedSeq.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    assert(rayleigh(got.map(_._2).toIndexedSeq) >= rayleigh(axis))
  }

  test("knn: majority vote of the true top-5 neighbors") {
    import spark.implicits._
    val got = q("q_knn_classify")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val qs = emb.filter(_._1 % 20 == 0)
    assert(got.length == qs.length)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val byId = got.map(r => r._1 -> r).toMap
    qs.foreach { case (qid, qe, qlabel) =>
      val top = emb.filter(_._1 != qid)
        .map { case (cid, ce, cl) => (cos(qe, ce), cid, cl) }
        .sortBy { case (s, cid, _) => (-s, cid) }.take(5)
      val votes = top.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (l, nv) => (-nv, l) }
      val (wantLabel, wantVotes) = votes.head
      val (_, lt, lp, nv, corr) = byId(qid)
      assert(lt == qlabel.toLong, s"q $qid true label")
      assert(lp == wantLabel.toLong, s"q $qid predicted")
      assert(nv == wantVotes.toLong, s"q $qid votes")
      assert(corr == (lp == lt))
    }
  }

  test("benford: frequencies sum to one; expectation is Benford's law") {
    import spark.implicits._
    val got = q("q_benford")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    val nTotal = got.map(_._2).sum
    assert(nTotal == graft.sources.Tables.load(spark, dir, "orders").count())
    got.foreach { case (d, n, obs, exp, dev) =>
      assert(obs == r6(n.toDouble / nTotal))
      assert(exp == r6(math.log10(1.0 + 1.0 / d)))
      assert(dev == obs - exp)
    }
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4)
  }

  test("bootstrap_ci: threshold table is the Poisson(1) CDF on the 2^16 grid") {
    val cdf = (0 to 6).scanLeft(0.0) { (acc, k) =>
      acc + math.exp(-1.0) / (1 to k).product
    }.tail // cdf(0..6)
    val expect = cdf.zipWithIndex.map { case (c, k) =>
      f"${math.floor(c * 65536.0).toLong}%04x" -> k.toLong
    }
    assert(graft.operators.MlOps.PoissonCdfHex == expect,
      s"thresholds must be floor(cdf·2^16) as 4-hex strings: $expect")
  }

  test("bootstrap_ci: exact match against a plain-Scala replica of the declared draw") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val thr = graft.operators.MlOps.PoissonCdfHex
    def draw(eventId: Long, b: Int): Long = {
      val dig = md5hex(s"${eventId}_${b / 8}")
      val u = dig.substring((b % 8) * 4, (b % 8) * 4 + 4)
      thr.collectFirst { case (hex, k) if u < hex => k }.getOrElse(7L)
    }
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val B = graft.operators.MlOps.BootReps
    val byType = ev.groupBy(_._2)
    val expect = byType.toSeq.sortBy(_._1).map { case (tpe, rows) =>
      val svs = rows.map { case (id, _, v) =>
        (id, math.floor(v * 10000.0 + 0.5).toLong) }
      val qms = (0 until B).flatMap { b =>
        var nb = 0L; var swv = 0L
        svs.foreach { case (id, sv) =>
          val w = draw(id, b); nb += w; swv += w * sv }
        if (nb > 0) Some((200L * swv + nb) / (2L * nb) -> b.toLong)
        else None
      }.sorted
      val n = svs.length.toLong
      val s0 = svs.map(_._2).sum
      val qmean = (200L * s0 + n) / (2L * n)
      (tpe, n, qmean / 1e6, qms(2)._1 / 1e6, qms(97)._1 / 1e6)
    }
    val got = q("q_bootstrap_ci")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    got.foreach { case (tpe, _, mean, lo, hi) =>
      assert(lo < hi, s"$tpe: degenerate CI [$lo,$hi]")
      assert(lo <= mean && mean <= hi,
        s"$tpe: point mean $mean outside CI [$lo,$hi]")
    }
  }

  test("embedding_drift: exact match against a plain-Scala replica; cosine in [-1,1]") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def halfOf(vecId: Long): Int = {
      val d0 = md.digest(vecId.toString.getBytes("UTF-8"))(0) & 0xff
      if (d0 < 0x80) 1 else 0
    }
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Long, Array[Float])].collect()
    val off = 4000000L
    val expect = vecs.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (label, rows) =>
        val dims = rows.head._3.length
        def centroid(h: Int): (Long, Array[Long]) = {
          val members = rows.filter(r => halfOf(r._1) == h)
          val n = members.size.toLong
          val c = Array.tabulate(dims) { i =>
            val sq = members.map(r =>
              math.floor(r._3(i).toDouble * 1e6 + 0.5).toLong).sum
            (2 * (sq + n * off) + n) / (2 * n) - off
          }
          (n, c)
        }
        val (na, ca) = centroid(1)
        val (nb, cb) = centroid(0)
        val dot = (0 until dims).map(i => ca(i) * cb(i)).sum
        val n2a = ca.map(v => v * v).sum
        val n2b = cb.map(v => v * v).sum
        val cos = math.floor(dot.toDouble /
          (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble))
          * 1e6 + 0.5) / 1e6
        (label, na, nb, Option(cos))
    }
    val got = q("q_embedding_drift")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    got.foreach { case (l, na, nb, c) =>
      assert(na > 0 && nb > 0, s"label $l: empty half")
      c.foreach(v => assert(v >= -1.0 && v <= 1.0, s"label $l: cos $v"))
    }
  }

  test("ks_drift: exact match against a plain-Scala replica; D in [0,1]") {
    import spark.implicits._
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .map { case (t, v) => (t, math.floor(v * 100.0 + 0.5).toLong) }
    val ref = ev.filter(_._1 == "view").map(_._2)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = ev.groupBy(_._1).filter(_._1 != "view").toSeq
      .sortBy(_._1).map { case (tpe, rows) =>
        val xs = rows.map(_._2)
        val cellsT = xs.groupBy(identity).view.mapValues(_.size.toLong)
        val cellsR = ref.groupBy(identity).view.mapValues(_.size.toLong)
        val jumps = (cellsT.keys ++ cellsR.keys).toSeq.distinct.sorted
        val nt = xs.length.toLong; val nr = ref.length.toLong
        var ct = 0L; var cr = 0L; var dmax = 0L
        jumps.foreach { q =>
          ct += cellsT.getOrElse(q, 0L); cr += cellsR.getOrElse(q, 0L)
          dmax = math.max(dmax, math.abs(ct * nr - cr * nt))
        }
        (tpe, nt, nr, r6(dmax.toDouble / (nt.toDouble * nr.toDouble)))
      }
    val got = q("q_ks_drift")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    got.foreach { case (t, _, _, d) =>
      assert(d >= 0.0 && d <= 1.0, s"$t: KS statistic $d out of [0,1]") }
  }

  test("conformal: exact match against a plain-Scala replica; coverage >= 0.9") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def isCal(id: Long): Boolean =
      (md.digest(id.toString.getBytes("UTF-8"))(0) & 0xff) < 0x80
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
      .map { case (id, t, v) =>
        (t, math.floor(v * 10000.0 + 0.5).toLong, isCal(id)) }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (tpe, rows) =>
        val train = rows.filter(!_._3).map(_._2)
        val cal = rows.filter(_._3).map(_._2)
        val nT = train.length.toLong
        val qyhat = (2 * train.sum + nT) / (2 * nT)
        val rs = cal.map(v => math.abs(v - qyhat)).sorted
        val nC = cal.length.toLong
        val k = ((nC + 1) * 9 + 9) / 10
        val qhat = rs(k.toInt - 1)
        val ncov = rs.count(_ <= qhat).toLong
        (tpe, nT, nC, qyhat / 1e4, qhat / 1e4,
          (qyhat - qhat) / 1e4, (qyhat + qhat) / 1e4,
          r6(ncov.toDouble / nC))
    }
    val got = q("q_conformal")
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    got.foreach { case (t, _, _, _, _, lo, hi, cov) =>
      assert(cov >= 0.9, s"$t: conformal coverage $cov below 0.9")
      assert(lo < hi, s"$t: degenerate interval")
    }
  }

  test("ips_eval: exact match against a plain-Scala replica; ESS fraction in (0,1]") {
    import spark.implicits._
    val target = Set("purchase", "click")
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
      .map { case (u, a, v) =>
        (u % 4, a, math.floor(v * 10000.0 + 0.5).toLong) }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (segIdx, rows) =>
        val n = rows.length.toLong
        val stot = rows.map(_._3).sum
        val byA = rows.groupBy(_._2).view
          .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
        val matches = byA.filter(kv => target(kv._1))
        def qw(c: Long) = (2L * 1000000L * n + 2L * c) / (4L * c)
        val nMatch = matches.values.map(_._1).sum
        val swr = matches.values.map { case (c, sr) => qw(c) * sr }.sum
        val sw = matches.values.map { case (c, _) => qw(c) * c }.sum
        val sw2 = matches.values.map { case (c, _) =>
          qw(c) * qw(c) * c }.sum
        (segIdx, n, nMatch,
          r6(swr.toDouble / (n.toDouble * 1.0e10)),
          r6(stot.toDouble / (n.toDouble * 10000.0)),
          r6((sw.toDouble * sw.toDouble) / (sw2.toDouble * n.toDouble)))
    }
    val got = q("q_ips_eval")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    got.foreach { case (seg, _, nMatch, vIps, _, ess) =>
      assert(nMatch > 0 && vIps > 0, s"seg $seg: degenerate estimate")
      assert(ess > 0.0 && ess <= 1.0, s"seg $seg: ESS fraction $ess")
    }
  }
}

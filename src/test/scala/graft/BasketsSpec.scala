package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the hot-item basket cap (operators.Baskets) behind
  * q_market_basket / q_recommend_cooccur: the cap must (a) pass items
  * under the cap through untouched, (b) clamp hot items to exactly
  * `cap` baskets chosen by the portable md5 order (verified against an
  * in-JVM replica of the hash ordering), and (c) be a no-op at the
  * driver's test scales so the declared outputs stay bit-identical to
  * the uncapped miner. */
class BasketsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Synthetic occurrences: hot item 1 in baskets 1..10, item 2 in
    * baskets 1..3, item 3 in basket 7 only. */
  private def occ() = {
    import spark.implicits._
    ((1L to 10L).map(b => (1L, b)) ++
      (1L to 3L).map(b => (2L, b)) ++ Seq((3L, 7L)))
      .toDF("item", "basket")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cap clamps hot items to exactly `cap` md5-first baskets") {
    import spark.implicits._
    val got = operators.Baskets.capPerItem(occ(), "item", "basket", 3L)
      .as[(Long, Long)].collect().toSet
    // per-item multiplicity bound
    val byItem = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byItem(1L) == 3, "hot item clamped to cap")
    assert(byItem(2L) == 3 && byItem(3L) == 1, "items under cap untouched")
    // the hot item's survivors are the 3 smallest md5("1_<b>") keys
    val expectHot = (1L to 10L)
      .sortBy(b => (md5Hex(s"1_$b"), b)).take(3).toSet
    assert(got.filter(_._1 == 1L).map(_._2) == expectHot,
      "survivors follow the portable md5 order")
  }

  test("cap is deterministic across runs and partitionings") {
    import spark.implicits._
    val once = operators.Baskets.capPerItem(occ(), "item", "basket", 3L)
      .as[(Long, Long)].collect().toSet
    val again = operators.Baskets
      .capPerItem(occ().repartition(7), "item", "basket", 3L)
      .as[(Long, Long)].collect().toSet
    assert(once == again)
  }

  test("declared miners are cap-invariant at test scale") {
    import spark.implicits._
    // uncapped replica of q_market_basket's support/lift core
    val items = sources.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val freq = items.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .filter($"c" >= 2L)
    val pruned = items.join(freq.select($"l_partkey"), "l_partkey")
    // the cap can only bind above DefaultCap baskets per item
    val maxPerItem = pruned.groupBy($"l_partkey")
      .agg(count(lit(1)).as("c")).agg(max($"c")).as[Long].head()
    assert(maxPerItem <= operators.Baskets.DefaultCap,
      s"test corpus exceeds the cap ($maxPerItem) — invariance void")
    val sup = pruned.select($"l_orderkey", $"l_partkey".as("part_a"))
      .join(pruned.select($"l_orderkey", $"l_partkey".as("part_b")),
        Seq("l_orderkey"))
      .filter($"part_a" < $"part_b")
      .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("support"))
      .filter($"support" >= 2L)
      .as[(Long, Long, Long)].collect().toSet
    val got = SparkEntry.queries("q_market_basket")(spark, dir)
      .select($"part_a", $"part_b", $"support")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == sup, "capped miner ≡ uncapped miner under the cap")
  }

  test("pairCore: both physical paths ≡ the definitional miner (random raw relations)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // pairCore routes between a collect_set fast path and the
    // prune+cap production path by a raw-count probe; BOTH must equal
    // the definitional miner (distinct → uniform-window cap →
    // self-join pairs → support filter) on RAW inputs with duplicate
    // occurrence rows. Seeds/caps chosen so both routes are exercised.
    val rnd = new scala.util.Random(11)
    var routes = Set.empty[Boolean]
    (1 to 6).foreach { trial =>
      val nItems = 2 + rnd.nextInt(8)
      val rows = (1 to nItems).flatMap { i =>
        val nb = 2 + rnd.nextInt(9)
        rnd.shuffle((1L to 12L).toList).take(nb)
          .flatMap(b => Seq.fill(1 + rnd.nextInt(2))((i.toLong, b)))
      }
      val occ = rnd.shuffle(rows).toDF("item", "basket")
      val cap = if (trial % 2 == 0) 96L else 3L
      val core = operators.Baskets.pairCore(occ, "item", "basket",
        cap = cap)
      try {
        routes += core.fast
        val dis = occ.distinct()
        val w = Window.partitionBy($"item").orderBy(
          md5(concat($"item".cast("string"), lit("_"),
            $"basket".cast("string"))), $"basket")
        val capped = dis.withColumn("rk", row_number().over(w))
          .filter($"rk" <= cap).drop("rk")
        val supDef = capped.select($"basket", $"item".as("part_a"))
          .join(capped.select($"basket", $"item".as("part_b")),
            Seq("basket"))
          .filter($"part_a" < $"part_b")
          .groupBy($"part_a", $"part_b")
          .agg(count(lit(1)).as("support"))
          .filter($"support" >= 2L)
          .as[(Long, Long, Long)].collect().toSet
        val gotSup = core.supHalf
          .as[(Long, Long, Long)].collect().toSet
        assert(gotSup == supDef,
          s"supHalf diverged (trial=$trial fast=${core.fast} cap=$cap)")
        // freq counts DISTINCT baskets per item, capped in closed form
        val freqDef = dis.groupBy($"item").agg(count(lit(1)).as("c"))
          .filter($"c" >= 2L)
          .select($"item", least($"c", lit(cap)).as("c"))
          .as[(Long, Long)].collect().toSet
        val gotFreq = core.freq.as[(Long, Long)].collect().toSet
        assert(gotFreq == freqDef,
          s"freq diverged (trial=$trial fast=${core.fast})")
        val nBasketsDef = dis.select($"basket").distinct().count()
        assert(core.baskets.as[Long].head() == nBasketsDef,
          s"basket count diverged (trial=$trial)")
      } finally core.release()
    }
    assert(routes == Set(true, false),
      s"both physical routes must be exercised, saw $routes")
  }

  test("hot/cold split ≡ the definitional single-window cap (random relations)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // capPerItem's broadcast anti/semi split is documented as a purely
    // physical optimization of the uniform row_number form — prove the
    // EQUALITY on random occurrence relations where the cap genuinely
    // bites, including ties in basket count at the cap boundary
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val items = 1 + rnd.nextInt(6)
      val rows = (1 to items).flatMap { i =>
        val nb = 1 + rnd.nextInt(12)
        rnd.shuffle((1L to 30L).toList).take(nb).map(b => (i.toLong, b))
      }
      val cap = 1L + rnd.nextInt(8)
      val occ = rows.toDF("item", "basket")
      val split = graft.operators.Baskets
        .capPerItem(occ, "item", "basket", cap)
        .as[(Long, Long)].collect().toSet
      val w = Window.partitionBy($"item").orderBy(
        md5(concat($"item".cast("string"), lit("_"),
          $"basket".cast("string"))), $"basket")
      val uniform = occ.withColumn("rk", row_number().over(w))
        .filter($"rk" <= cap).drop("rk")
        .as[(Long, Long)].collect().toSet
      assert(split == uniform,
        s"split/uniform divergence at cap=$cap on ${rows.size} rows")
    }
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder diagnostic (not a declared query): exploded-pair-volume slope
  * of the basket miners (q_market_basket, q_recommend_cooccur) under a
  * PLANTED POWER-LAW HUB — the hazard [[graft.operators.Baskets]] caps.
  *
  * Data: a hub item (id 0) planted in ALL D baskets, plus 4 background
  * items per basket cycling through a 997-id pool. The pair stage's cost
  * is the EXPLODED pair volume before the support aggregate; the hub
  * contributes D·k̄ of it raw (linear in its popularity — the only
  * super-linear ScaleProbe slope measured in round 6), but at most
  * cap·k̄ once [[graft.operators.Baskets.capPerItem]] clamps the hub to
  * its first [[graft.operators.Baskets.DefaultCap]] baskets.
  *
  * For each D it prints:
  *   - rawPairs / rawHub — uncapped exploded pairs (total / hub-touching),
  *   - capPairs / capHub — same through capPerItem (hub row is flat),
  *   - fast — the [[graft.operators.Baskets.pairCore]] route taken
  *     (must be `false` here: the hub's raw count D exceeds the cap, so
  *     the probe sends the miner down the prune+cap production path),
  *   - coreSec — wall time for the production pairCore to seal supHalf.
  *
  * Usage: sbt "runMain graft.tools.BasketProbe [D ...]"
  * (default 512 2048 4096 — a 1×/4×/8× hub-popularity sweep)
  */
object BasketProbe {
  def main(args: Array[String]): Unit = {
    val ds = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(512, 2048, 4096)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def explodedPairs(occ: DataFrame): DataFrame =
      occ.groupBy($"basket").agg(collect_set($"item").as("ps"))
        .select(explode($"ps").as("a"), $"ps")
        .select($"a", explode($"ps").as("b"))
        .filter($"a" < $"b")

    ds.foreach { d =>
      val occ = (1 to d).flatMap { b =>
        val bg = (1 to 4).map(j => 1L + ((b.toLong * 7 + j * 131) % 997))
        (0L +: bg).distinct.map(i => (b.toLong, i))
      }.toDF("basket", "item")

      val raw = explodedPairs(occ).persist()
      val rawPairs = raw.count()
      val rawHub = raw.filter($"a" === 0L).count() // hub is min id: always `a`
      raw.unpersist(false)

      val capped = graft.operators.Baskets.capPerItem(occ, "item", "basket")
      val cap = explodedPairs(capped).persist()
      val capPairs = cap.count()
      val capHub = cap.filter($"a" === 0L).count()
      cap.unpersist(false)

      val t0 = System.nanoTime()
      val core = graft.operators.Baskets.pairCore(occ, "item", "basket")
      val sup = core.supHalf.count()
      val coreSec = (System.nanoTime() - t0) / 1e9
      core.release()

      println(f"D=$d%6d  rawPairs=$rawPairs%9d  rawHub=$rawHub%8d" +
        f"  capPairs=$capPairs%9d  capHub=$capHub%7d" +
        f"  fast=${core.fast}%-5s  supPairs=$sup%7d  coreSec=$coreSec%.2f")
    }
    spark.stop()
  }
}

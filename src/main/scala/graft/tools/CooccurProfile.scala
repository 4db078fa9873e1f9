package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition for the pair miners (q_recommend_cooccur /
  * q_market_basket): times each pipeline stage in isolation (warm, on a
  * cached items relation) so a bench regression can be attributed to a
  * STAGE instead of guessed at. Usage:
  *   runMain graft.tools.CooccurProfile <sfDir>
  */
object CooccurProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val lineitem = graft.sources.Tables.load(spark, dir, "lineitem")
    lineitem.count() // warm FS cache

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val items = time("distinct+persist") {
        val it = lineitem.select($"l_orderkey", $"l_partkey").distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        it.count()
        it
      }
      val freq0 = time("freq0 agg+persist") {
        val f = items.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
          .filter($"c" >= 2L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count()
        f
      }
      val pruned = items.join(broadcast(freq0.select($"l_partkey")),
        "l_partkey")
      val capped = time("capPerItem (probe only)") {
        graft.operators.Baskets.capPerItem(pruned, "l_partkey",
          "l_orderkey", counts = Some(freq0))
      }
      time("baskets distinct count") {
        items.select($"l_orderkey").distinct().count()
      }
      val supHalf = capped.groupBy($"l_orderkey")
        .agg(collect_list($"l_partkey").as("parts"))
        .select(explode($"parts").as("part_a"), $"parts")
        .select($"part_a", explode($"parts").as("part_b"))
        .filter($"part_a" < $"part_b")
        .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("support"))
        .filter($"support" >= 2L)
      val supCount = time("pair stage (to count)") { supHalf.count() }
      println(s"[prof] pair rows (a<b, sup>=2): $supCount")
      val freq = freq0.select($"l_partkey",
        least($"c", lit(graft.operators.Baskets.DefaultCap)).as("c"))
      val full = time("full tail (joins+window)") {
        val sup = supHalf.unionByName(supHalf.select(
          $"part_b".as("part_a"), $"part_a".as("part_b"), $"support"))
        val baskets = items.select($"l_orderkey").distinct()
          .agg(count(lit(1)).as("n_baskets"))
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val conf = graft.Det.round6($"support".cast(DoubleType)
          / $"c_a".cast(DoubleType))
        val lift = graft.Det.round6(($"n_baskets".cast(DoubleType)
          * $"support".cast(DoubleType))
          / ($"c_a".cast(DoubleType) * $"c_b".cast(DoubleType)))
        val w = Window.partitionBy($"part_a")
          .orderBy($"confidence".desc, $"support".desc, $"part_b")
        sup
          .join(broadcast(freq.select($"l_partkey".as("part_a"),
            $"c".as("c_a"))), "part_a")
          .join(broadcast(freq.select($"l_partkey".as("part_b"),
            $"c".as("c_b"))), "part_b")
          .crossJoin(broadcast(baskets))
          .select($"part_a", $"part_b", $"support",
            conf.as("confidence"), lift.as("lift"))
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter($"rn" <= 3)
          .count()
      }
      println(s"[prof] final rows: $full")
      locally {
        val lst = new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val desc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            t0.put(e.jobId, System.nanoTime())
            val d = Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("?")
            val stg = e.stageInfos.map(si =>
              s"${si.name.take(40)}#${si.numTasks}").mkString(" | ")
            desc.put(e.jobId, s"${d.take(60)} [$stg]")
          }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val dt = (System.nanoTime() - t0.getOrDefault(e.jobId, 0L)) / 1e9
            println(f"[job] id=${e.jobId}%-4d ${dt}%6.2f s  ${desc.getOrDefault(e.jobId, "?")}")
          }
        }
        spark.sparkContext.addSparkListener(lst)
        time("seal-form end-to-end") {
          graft.SparkEntry.queries("q_recommend_cooccur")(spark, dir).count()
        }
        spark.sparkContext.removeSparkListener(lst)
      }
      freq0.unpersist(true)
      items.unpersist(true)

      // ---- variant C: one collect_set shuffle, pairs off cached lists
      val vcRows = time("variantC end-to-end") {
        val sets = lineitem
          .select($"l_orderkey", $"l_partkey")
          .groupBy($"l_orderkey")
          .agg(collect_set($"l_partkey").as("parts"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val f0 = sets.select(explode($"parts").as("l_partkey"))
          .groupBy($"l_partkey").agg(count(lit(1)).as("c"))
          .filter($"c" >= 2L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val hot = f0.filter($"c" > graft.operators.Baskets.DefaultCap)
          val cappedSets =
            if (hot.isEmpty) sets
            else {
              val occ = sets.select($"l_orderkey",
                explode($"parts").as("l_partkey"))
              val pruned = occ.join(broadcast(f0.select($"l_partkey")),
                "l_partkey")
              graft.operators.Baskets
                .capPerItem(pruned, "l_partkey", "l_orderkey",
                  counts = Some(f0))
                .groupBy($"l_orderkey")
                .agg(collect_set($"l_partkey").as("parts"))
            }
          val supHalf = cappedSets
            .select(explode($"parts").as("part_a"), $"parts")
            .select($"part_a", explode($"parts").as("part_b"))
            .filter($"part_a" < $"part_b")
            .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("support"))
            .filter($"support" >= 2L)
          val sup = supHalf.unionByName(supHalf.select(
            $"part_b".as("part_a"), $"part_a".as("part_b"), $"support"))
          val freq = f0.select($"l_partkey",
            least($"c", lit(graft.operators.Baskets.DefaultCap)).as("c"))
          val baskets = sets.agg(count(lit(1)).as("n_baskets"))
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.types.{DoubleType, LongType}
          val conf = graft.Det.round6($"support".cast(DoubleType)
            / $"c_a".cast(DoubleType))
          val lift = graft.Det.round6(($"n_baskets".cast(DoubleType)
            * $"support".cast(DoubleType))
            / ($"c_a".cast(DoubleType) * $"c_b".cast(DoubleType)))
          val w = Window.partitionBy($"part_a")
            .orderBy($"confidence".desc, $"support".desc, $"part_b")
          sup
            .join(broadcast(freq.select($"l_partkey".as("part_a"),
              $"c".as("c_a"))), "part_a")
            .join(broadcast(freq.select($"l_partkey".as("part_b"),
              $"c".as("c_b"))), "part_b")
            .crossJoin(broadcast(baskets))
            .select($"part_a", $"part_b", $"support",
              conf.as("confidence"), lift.as("lift"))
            .withColumn("rn", row_number().over(w).cast(LongType))
            .filter($"rn" <= 3)
            .localCheckpoint(true)
            .count()
        } finally {
          f0.unpersist(false)
          sets.unpersist(false)
        }
      }
      println(s"[prof] variantC rows: $vcRows")

      // ---- variant D: zero persists — one plan, exchange reuse dedupes
      val vdRows = time("variantD end-to-end") {
        val items = lineitem.select($"l_orderkey", $"l_partkey").distinct()
        val f0 = items.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
          .filter($"c" >= 2L)
        val pruned = items.join(broadcast(f0.select($"l_partkey")),
          "l_partkey")
        val capped = graft.operators.Baskets
          .capPerItem(pruned, "l_partkey", "l_orderkey", counts = Some(f0))
        val freq = f0.select($"l_partkey",
          least($"c", lit(graft.operators.Baskets.DefaultCap)).as("c"))
        val supHalf = capped.groupBy($"l_orderkey")
          .agg(collect_list($"l_partkey").as("parts"))
          .select(explode($"parts").as("part_a"), $"parts")
          .select($"part_a", explode($"parts").as("part_b"))
          .filter($"part_a" < $"part_b")
          .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("support"))
          .filter($"support" >= 2L)
        val sup = supHalf.unionByName(supHalf.select(
          $"part_b".as("part_a"), $"part_a".as("part_b"), $"support"))
        val baskets = items.select($"l_orderkey").distinct()
          .agg(count(lit(1)).as("n_baskets"))
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val conf = graft.Det.round6($"support".cast(DoubleType)
          / $"c_a".cast(DoubleType))
        val lift = graft.Det.round6(($"n_baskets".cast(DoubleType)
          * $"support".cast(DoubleType))
          / ($"c_a".cast(DoubleType) * $"c_b".cast(DoubleType)))
        val w = Window.partitionBy($"part_a")
          .orderBy($"confidence".desc, $"support".desc, $"part_b")
        sup
          .join(broadcast(freq.select($"l_partkey".as("part_a"),
            $"c".as("c_a"))), "part_a")
          .join(broadcast(freq.select($"l_partkey".as("part_b"),
            $"c".as("c_b"))), "part_b")
          .crossJoin(broadcast(baskets))
          .select($"part_a", $"part_b", $"support",
            conf.as("confidence"), lift.as("lift"))
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter($"rn" <= 3)
          .localCheckpoint(true)
          .count()
      }
      println(s"[prof] variantD rows: $vdRows")

      // ---- variant E: collect_set hub, zero persists, one plan
      val veRows = time("variantE end-to-end") {
        val sets = lineitem
          .select($"l_orderkey", $"l_partkey")
          .groupBy($"l_orderkey")
          .agg(collect_set($"l_partkey").as("parts"))
        val f0 = sets.select(explode($"parts").as("l_partkey"))
          .groupBy($"l_partkey").agg(count(lit(1)).as("c"))
          .filter($"c" >= 2L)
        val freq = f0.select($"l_partkey",
          least($"c", lit(graft.operators.Baskets.DefaultCap)).as("c"))
        val supHalf = sets
          .select(explode($"parts").as("part_a"), $"parts")
          .select($"part_a", explode($"parts").as("part_b"))
          .filter($"part_a" < $"part_b")
          .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("support"))
          .filter($"support" >= 2L)
        val sup = supHalf.unionByName(supHalf.select(
          $"part_b".as("part_a"), $"part_a".as("part_b"), $"support"))
        val baskets = sets.agg(count(lit(1)).as("n_baskets"))
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val conf = graft.Det.round6($"support".cast(DoubleType)
          / $"c_a".cast(DoubleType))
        val lift = graft.Det.round6(($"n_baskets".cast(DoubleType)
          * $"support".cast(DoubleType))
          / ($"c_a".cast(DoubleType) * $"c_b".cast(DoubleType)))
        val w = Window.partitionBy($"part_a")
          .orderBy($"confidence".desc, $"support".desc, $"part_b")
        sup
          .join(broadcast(freq.select($"l_partkey".as("part_a"),
            $"c".as("c_a"))), "part_a")
          .join(broadcast(freq.select($"l_partkey".as("part_b"),
            $"c".as("c_b"))), "part_b")
          .crossJoin(broadcast(baskets))
          .select($"part_a", $"part_b", $"support",
            conf.as("confidence"), lift.as("lift"))
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter($"rn" <= 3)
          .localCheckpoint(true)
          .count()
      }
      println(s"[prof] variantE rows: $veRows")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-JVM interleaved A/B of the PQ training argmax forms — kills
  * the host-window drift that makes cross-JVM TimeQ pairs ambiguous
  * (memory: bench-noise-discipline). Arms alternate A,B,A,B,... inside
  * one session; each timing is a noop-sink run (guide §1.4) of the SAME
  * subspace relation:
  *
  *   A = max(struct(cs, nc, e))   (SortAggregate, per-row struct copy)
  *   B = graft_argmax_vec         (ObjectHashAggregate, copy-on-improve)
  *
  * plus the full pqTrain chain (which is form B in HEAD) so the bisect
  * delta is visible in context. runMain graft.tools.ArgmaxAb <sfDir>. */
object ArgmaxAb {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    import graft.operators.Similarity

    val n = Similarity.ivfVectors(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    n.count()
    val nmAll = graft.Exec.fanOut(Similarity.pqSubspaces(n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nmAll.count()

    // mirrors pqTrain's seed/join head (kept inline because the two
    // arms time SUB-fragments pqTrain doesn't expose; AnnBisect times
    // the real full chain) — K from the shared constant so a geometry
    // re-pin can't silently drift this A/B
    val k = Similarity.PqDefaultK
    val seedOrd = Seq(md5($"vec_id".cast("string")), $"vec_id")
    val seedIds = nmAll.filter($"m" === 0).select($"vec_id")
      .orderBy(seedOrd: _*).limit(k)
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(seedOrd: _*))
        .cast("long"))
    val seeds = nmAll.join(broadcast(seedIds), Seq("vec_id"))
      .select($"m", $"cid", $"e".as("ce"))
    def joined = nmAll.join(broadcast(seeds), Seq("m"))
      .withColumn("csim", graft.Det.round6(
        graft.functions.VectorFunctions.cosine($"e", $"ce")))
    def armA = joined.groupBy($"m", $"vec_id")
      .agg(max(struct($"csim".as("cs"), (-$"cid").as("nc"), $"e".as("e")))
        .as("x"))
      .select($"m", $"vec_id", (-$"x.nc").as("cell"), $"x.e".as("e"))
    def armB = joined.groupBy($"m", $"vec_id")
      .agg(graft.functions.VectorFunctions
        .argmaxVec($"csim", -$"cid", $"e").as("x"))
      .select($"m", $"vec_id", (-$"x.nc").as("cell"), $"x.e".as("e"))

    // result parity first: the two arms must agree row-for-row
    // ((m, vec_id) is the group key, so the join is 1:1)
    val diff = armA.withColumnRenamed("e", "ea").withColumnRenamed("cell", "ca")
      .join(armB.withColumnRenamed("e", "eb").withColumnRenamed("cell", "cb"),
        Seq("m", "vec_id"), "full_outer")
      // null-safe: both-arms-null is agreement, not a disagreement
      .filter(!($"ca" <=> $"cb") || !($"ea" <=> $"eb"))
      .count()
    println(s"[argmax_ab] subspace arm disagreement rows = $diff (must be 0)")

    def time(thunk: => Unit): Double = {
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }
    def runPair(label: String, a: => DataFrame, b: => DataFrame): Unit = {
      noop(a); noop(b) // warm
      val rounds = 5
      val as = Array.ofDim[Double](rounds)
      val bs = Array.ofDim[Double](rounds)
      (0 until rounds).foreach { i =>
        as(i) = time(noop(a))
        bs(i) = time(noop(b))
      }
      def fmt(xs: Array[Double]) =
        f"min=${xs.min}%5.2f med=${xs.sorted.apply(xs.length / 2)}%5.2f  (" +
          xs.map(x => f"$x%4.2f").mkString(", ") + ")"
      println(s"[argmax_ab] $label A max(struct): ${fmt(as)}")
      println(s"[argmax_ab] $label B argmax_vec:  ${fmt(bs)}")
    }
    runPair("pq(d=4,fanned)", armA, armB)

    // the COARSE Lloyd argmax: d=64 payload, UNFANNED vector hub (the
    // r16 reverted-fanOut site), C = ceil(sqrt(N)) seed centroids — the
    // shape kmeansCodebook runs per round inside q_ann_ivf/ivfpq/rerank
    val cC = Similarity.ivfDefaultC(n.count())
    val cSeedOrd = Seq(md5($"vec_id".cast("string")), $"vec_id")
    val cSeeds = n.select($"vec_id", $"e").orderBy(cSeedOrd: _*).limit(cC)
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(cSeedOrd: _*))
        .cast("long"))
      .select($"cid", $"e".as("ce"))
      .localCheckpoint(true)
    def cJoined = n.crossJoin(broadcast(cSeeds))
      .withColumn("csim", graft.Det.round6(
        graft.functions.VectorFunctions.cosine($"e", $"ce")))
    def cArmA = cJoined.groupBy($"vec_id")
      .agg(max(struct($"csim".as("cs"), (-$"cid").as("nc"), $"e".as("e")))
        .as("m"))
      .select($"vec_id", (-$"m.nc").as("cell"), $"m.e".as("e"))
    def cArmB = cJoined.groupBy($"vec_id")
      .agg(graft.functions.VectorFunctions
        .argmaxVec($"csim", -$"cid", $"e").as("m"))
      .select($"vec_id", (-$"m.nc").as("cell"), $"m.e".as("e"))
    val cDiff = cArmA.withColumnRenamed("e", "ea").withColumnRenamed("cell", "ca")
      .join(cArmB.withColumnRenamed("e", "eb").withColumnRenamed("cell", "cb"),
        Seq("vec_id"), "full_outer")
      .filter(!($"ca" <=> $"cb") || !($"ea" <=> $"eb"))
      .count()
    println(s"[argmax_ab] coarse arm disagreement rows = $cDiff (must be 0)")
    runPair("coarse(d=64)", cArmA, cArmB)

    // the full chain as shipped (form B + sealed consumers downstream)
    val t0 = System.nanoTime()
    noop(Similarity.pqTrain(nmAll, k))
    println(f"[argmax_ab] pqTrain_full(HEAD) ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    spark.stop()
  }
}

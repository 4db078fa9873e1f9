package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Times each stage of the PQ/IVF-PQ chain in isolation (noop-sink
  * discipline, guide §1.4) to find where q_ann_pq/q_ann_ivfpq wall-clock
  * actually goes. runMain graft.tools.AnnBisect <sfDir>. */
object AnnBisect {
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

    def time(label: String)(thunk: => Unit): Unit = {
      thunk
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      println(f"[bisect] $label%-28s min=${ts.min}%6.2fs  (${ts.mkString(", ")})")
    }

    val n = Similarity.ivfVectors(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    n.count()
    val nmAll = Similarity.pqSubspaces(n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nmAll.count()

    // seed/join fragments mirror pqTrain's head so the aggregate can be
    // timed in isolation; the FULL chain below calls the real
    // Similarity.pqTrain (private[graft] since r17, per r16 ADVICE — no
    // hand-kept replica to drift)
    val k = Similarity.PqDefaultK
    val seedOrd = Seq(md5($"vec_id".cast("string")), $"vec_id")
    def seedIds = nmAll.filter($"m" === 0).select($"vec_id")
      .orderBy(seedOrd: _*).limit(k)
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(seedOrd: _*))
        .cast("long"))
    def seeds = nmAll.join(broadcast(seedIds), Seq("vec_id"))
      .select($"m", $"cid", $"e".as("ce"))

    time("nmAll_scan")(noop(nmAll))
    time("seeds")(noop(seeds))
    // the join+cosine WITHOUT the aggregate
    def joined = nmAll.join(broadcast(seeds), Seq("m"))
      .withColumn("csim", graft.Det.round6(
        graft.functions.VectorFunctions.cosine($"e", $"ce")))
    time("join_cosine_only")(noop(joined.select($"m", $"vec_id", $"csim")))
    // both argmax forms over the same join: the r16 built-in (vector
    // materialized per row under SortAggregate) vs the r17 typed
    // aggregate (ObjectHashAggregate, copy-on-improve)
    time("argmax_struct(r16)")(noop(
      joined.groupBy($"m", $"vec_id")
        .agg(max(struct($"csim".as("cs"), (-$"cid").as("nc"), $"e".as("e")))
          .as("x"))))
    time("argmax_vec(r17)")(noop(
      joined.groupBy($"m", $"vec_id")
        .agg(graft.functions.VectorFunctions
          .argmaxVec($"csim", -$"cid", $"e").as("x"))))
    time("pqTrain_full")(noop(Similarity.pqTrain(nmAll)))
    val cent = Similarity.pqTrain(nmAll).localCheckpoint(true)
    time("pqAssign")(noop(Similarity.pqAssign(nmAll, cent)))
    spark.stop()
  }
}

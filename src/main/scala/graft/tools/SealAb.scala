package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-JVM interleaved A/B of the round-17 codebook seals: arm S
  * runs a declared query normally (trained codebooks sealed via
  * Exec.seal), arm U runs it under Exec.withLazyPlans where every seal
  * is the identity — i.e. the pre-seal plan in the SAME session/window.
  *
  * CONFOUND (post-hoc review): arm U is lazy, so a query fn whose
  * `finally` unpersists its intermediates does so BEFORE the timed
  * count() executes anything — arm U recomputes those persisted hubs
  * from scratch as well as skipping the seals. The arms therefore
  * compare seal+persist vs neither, a bias TOWARD the sealed arm. The
  * r17 decision this tool fed (do NOT seal — unsealed measured
  * wash-at-32/win-at-8 DESPITE the handicap) survives the bias; do not
  * reuse this tool for a seal that is expected to LOSE, where the bias
  * could flip the verdict. runMain graft.tools.SealAb <sfDir> <query...> */
object SealAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.schemas.keys.foreach { t =>
      graft.sources.Tables.load(spark, dir, t).count()
    }
    def time(thunk: => Unit): Double = {
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm both arms
      fn(spark, dir).count()
      graft.Exec.withLazyPlans(fn(spark, dir).count())
      val rounds = 4
      val s = Array.ofDim[Double](rounds)
      val u = Array.ofDim[Double](rounds)
      (0 until rounds).foreach { i =>
        s(i) = time(fn(spark, dir).count())
        u(i) = time(graft.Exec.withLazyPlans(fn(spark, dir).count()))
      }
      def fmt(xs: Array[Double]) =
        f"min=${xs.min}%5.2f med=${xs.sorted.apply(xs.length / 2)}%5.2f  (" +
          xs.map(x => f"$x%4.2f").mkString(", ") + ")"
      println(s"[seal_ab] $name sealed:   ${fmt(s)}")
      println(s"[seal_ab] $name unsealed: ${fmt(u)}")
    }
    spark.stop()
  }
}

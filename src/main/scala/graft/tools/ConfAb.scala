package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-JVM interleaved A/B of a RUNTIME-settable SQL conf (AQE knobs,
  * advisory sizes, ...): arm A runs each query under the session
  * defaults, arm B under the given key=value overrides, alternating
  * A,B,A,B inside one session so host-window drift cancels (memory:
  * bench-noise-discipline). Confs are restored after every B pass so the
  * arms never leak into each other.
  *
  *   runMain graft.tools.ConfAb <sfDir> <k=v[,k=v...]> <query...>
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val confs = args(1).split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }.toSeq
    val names = args.drop(2)
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
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def setB(): Unit = confs.foreach { case (k, v) => spark.conf.set(k, v) }
    def setA(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    def time(thunk: => Unit): Double = {
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm A
      setB(); fn(spark, dir).count(); setA() // warm B
      val rounds = 4
      val as = Array.ofDim[Double](rounds)
      val bs = Array.ofDim[Double](rounds)
      (0 until rounds).foreach { i =>
        as(i) = time(fn(spark, dir).count())
        setB()
        bs(i) = time(fn(spark, dir).count())
        setA()
      }
      def fmt(xs: Array[Double]) =
        f"min=${xs.min}%5.2f med=${xs.sorted.apply(xs.length / 2)}%5.2f  (" +
          xs.map(x => f"$x%4.2f").mkString(", ") + ")"
      println(s"[conf_ab] $name A default: ${fmt(as)}")
      println(s"[conf_ab] $name B override: ${fmt(bs)}")
    }
    spark.stop()
  }
}

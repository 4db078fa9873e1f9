package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-partitioned-join probe (builder tooling): measures what the
  * bucketed-zone layout buys and what it costs on the sf0.1 corpus.
  *
  *   runMain graft.tools.SpjProbe [sfDir] [buckets]
  *
  * Emits one line per measurement:
  *   - join wall-clock, bucketed zones (SPJ, zero exchanges) vs
  *     unbucketed zones (ordinary shuffled SMJ), min-of-3 warm;
  *   - single-table scan task counts on the bucketed zone with the SPJ
  *     conf on vs off — the grouped-scan parallelism trade (one task
  *     per bucket when the layout is reported), which is why bucket
  *     counts are sized like Hive buckets: at cluster width, not
  *     single digits.
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("spj_probe").toString
    val cat = "spjprobe"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.p")

    // replicate k× with shifted keys so the join is heavy enough for
    // the shuffle-vs-SPJ delta to rise above job overhead
    val k = args.lift(2).map(_.toInt).getOrElse(1)
    def rep(df: org.apache.spark.sql.DataFrame, keyCol: String,
            shift: Long): org.apache.spark.sql.DataFrame =
      (0 until k).map(i => df.withColumn(keyCol,
        col(keyCol) + lit(i * shift))).reduce(_ unionAll _)
    val cust = rep(graft.sources.Tables.load(spark, sfDir, "customer")
      .select($"c_custkey", $"c_mktsegment"), "c_custkey", 10000000L)
    val ords = rep(graft.sources.Tables.load(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      "o_custkey", 10000000L)

    def create(name: String, df: org.apache.spark.sql.DataFrame,
               key: Option[String]): Unit = key match {
      case Some(k) => df.writeTo(s"$cat.p.$name")
        .partitionedBy(bucket(buckets, col(k))).create()
      case None => df.writeTo(s"$cat.p.$name").create()
    }
    create("cust_b", cust, Some("c_custkey"))
    create("ords_b", ords, Some("o_custkey"))
    create("cust_u", cust, None)
    create("ords_u", ords, None)

    def joinQ(suffix: String) = spark.sql(
      s"""SELECT c_mktsegment, count(*) n, sum(o_totalprice) s
         |FROM $cat.p.cust_$suffix c JOIN $cat.p.ords_$suffix o
         |ON c.c_custkey = o.o_custkey GROUP BY c_mktsegment""".stripMargin)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    Seq("b", "u").foreach { s =>
      joinQ(s).count() // warm
      val t = (1 to 3).map(_ => time(joinQ(s).count())).min
      val rows = spark.table(s"$cat.p.ords_$s").count()
      println(f"[spj] join_${if (s == "b") "bucketed_spj" else "unbucketed_shuffle"} ${t}%.3f s ($rows fact rows)")
    }

    // grouped-scan parallelism: task count of a single-table aggregate
    def scanTasks(): Int = {
      val df = spark.table(s"$cat.p.ords_b").groupBy().sum("o_totalprice")
      df.collect()
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.orElse {
        def walk(p: org.apache.spark.sql.execution.SparkPlan)
            : Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
          p match {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
              Some(b)
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan)
            case o => o.children.view.flatMap(walk).headOption
          }
        walk(df.queryExecution.executedPlan)
      }
      scan.map(_.inputRDD.getNumPartitions).getOrElse(-1)
    }
    println(s"[spj] single_scan_tasks_conf_on ${scanTasks()}")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    println(s"[spj] single_scan_tasks_conf_off ${scanTasks()}")
    spark.stop()
  }
}

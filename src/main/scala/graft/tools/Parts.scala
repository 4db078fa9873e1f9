package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the scan partition count and per-partition row counts of each
  * base table plus the ANN vector hub — is the fixture parallel at all?
  * runMain graft.tools.Parts <sfDir>. */
object Parts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.schemas.keys.toSeq.sorted.foreach { t =>
      val df = graft.sources.Tables.load(spark, dir, t)
      val counts = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
      println(s"[parts] $t parts=${counts.length} nonEmpty=${counts.count(_ > 0)} rows=${counts.sum}")
    }
    val n = graft.operators.Similarity.ivfVectors(spark, dir)
    val c = n.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println(s"[parts] ivfVectors parts=${c.length} nonEmpty=${c.count(_ > 0)} rows=${c.sum}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug aid: run a declared query both ways — the DataFrame form and
  * its oracle SQL via spark.sql over registered views — and print the
  * first differing rows. Usage:
  *   runMain graft.tools.DiffSql <sfDir> <query> */
object DiffSql {
  def main(args: Array[String]): Unit = {
    val (dir, name) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, dir)
    val sql = spark.sql(graft.SparkEntry.oracleSql(name)).collect()
    val df = graft.SparkEntry.queries(name)(spark, dir).collect()
    println(s"[diffsql] sql=${sql.length} df=${df.length} rows")
    sql.zipAll(df, null, null).zipWithIndex
      .filter { case ((a, b), _) => a == null || b == null || a != b }
      .take(5)
      .foreach { case ((a, b), i) =>
        println(s"[diffsql] row $i\n  sql: $a\n  df : $b")
      }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage decomposition for q_substring_dedup (builder tooling):
  * times gram build, gram self-join, and the islands window separately
  * so the 2.4×-vs-DuckDB residual can be attributed. */
object SubstrProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val k = 8
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[substr] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"[substr] pass $pass")
      val grams = graft.sources.Tables.load(spark, dir, "documents")
        .withColumn("toks", split(lower($"text"), " "))
        .filter(size($"toks") >= k)
        .select($"doc_id", explode(expr(
          s"""transform(sequence(1, size(toks) - ${k - 1}),
             |  g -> struct(g AS pos, array_join(slice(toks, g, $k), ' ') AS gram))"""
            .stripMargin)).as("kg"))
        .select($"doc_id", $"kg.pos".as("pos"), $"kg.gram".as("gram"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("gram build+persist")(grams.count())
      val candJ = grams.select($"doc_id".as("doc_a"), $"pos".as("pa"), $"gram")
        .join(grams.select($"doc_id".as("doc_b"), $"pos".as("pb"), $"gram"),
          "gram")
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"pa", ($"pa" - $"pb").as("diag"))
      time("self-join count")(candJ.count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pa")
      time("islands+agg")(candJ
        .withColumn("isl", $"pa" - row_number().over(w))
        .groupBy($"doc_a", $"doc_b", $"diag", $"isl")
        .agg(count(lit(1)).as("m"))
        .groupBy($"doc_a", $"doc_b")
        .agg((max($"m") + (k - 1)).as("max_run"))
        .filter($"max_run" >= 15).count())
      // hashed-gram variant: portable 60-bit md5 key instead of the string
      val hg = grams.withColumn("g60", expr(
        "CAST(conv(substr(md5(gram), 1, 15), 16, 10) AS BIGINT)"))
        .select($"doc_id", $"pos", $"g60")
      val candH = hg.select($"doc_id".as("doc_a"), $"pos".as("pa"), $"g60")
        .join(hg.select($"doc_id".as("doc_b"), $"pos".as("pb"), $"g60"),
          "g60")
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"pa", ($"pa" - $"pb").as("diag"))
      time("hashed self-join count")(candH.count())
      grams.unpersist(true)
      // xxhash64-over-slice variant: no gram STRING is ever built — the
      // join key is a 64-bit hash of the token sub-array itself
      val gx = graft.sources.Tables.load(spark, dir, "documents")
        .withColumn("toks", split(lower($"text"), " "))
        .filter(size($"toks") >= k)
        .select($"doc_id", explode(expr(
          s"""transform(sequence(1, size(toks) - ${k - 1}),
             |  g -> struct(g AS pos, xxhash64(slice(toks, g, $k)) AS gh))"""
            .stripMargin)).as("kg"))
        .select($"doc_id", $"kg.pos".as("pos"), $"kg.gh".as("gh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("xx gram build+persist")(gx.count())
      val candX = gx.select($"doc_id".as("doc_a"), $"pos".as("pa"), $"gh")
        .join(gx.select($"doc_id".as("doc_b"), $"pos".as("pb"), $"gh"), "gh")
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"pa", ($"pa" - $"pb").as("diag"))
      val wx = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pa")
      time("xx full pipeline")(candX
        .withColumn("isl", $"pa" - row_number().over(wx))
        .groupBy($"doc_a", $"doc_b", $"diag", $"isl")
        .agg(count(lit(1)).as("m"))
        .groupBy($"doc_a", $"doc_b")
        .agg((max($"m") + (k - 1)).as("max_run"))
        .filter($"max_run" >= 15).count())
      gx.unpersist(true)
      // same xx pipeline, NO persist: the tokenize+hash recomputes into
      // both join map sides but the cache-write job disappears
      val gn = graft.sources.Tables.load(spark, dir, "documents")
        .withColumn("toks", split(lower($"text"), " "))
        .filter(size($"toks") >= k)
        .select($"doc_id", explode(expr(
          s"""transform(sequence(1, size(toks) - ${k - 1}),
             |  g -> struct(g AS pos, xxhash64(slice(toks, g, $k)) AS gh))"""
            .stripMargin)).as("kg"))
        .select($"doc_id", $"kg.pos".as("pos"), $"kg.gh".as("gh"))
      val candN = gn.select($"doc_id".as("doc_a"), $"pos".as("pa"), $"gh")
        .join(gn.select($"doc_id".as("doc_b"), $"pos".as("pb"), $"gh"), "gh")
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"pa", ($"pa" - $"pb").as("diag"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pa")
      time("xx nopersist full")(candN
        .withColumn("isl", $"pa" - row_number().over(wn))
        .groupBy($"doc_a", $"doc_b", $"diag", $"isl")
        .agg(count(lit(1)).as("m"))
        .groupBy($"doc_a", $"doc_b")
        .agg((max($"m") + (k - 1)).as("max_run"))
        .filter($"max_run" >= 15).count())
    }
    spark.stop()
  }
}

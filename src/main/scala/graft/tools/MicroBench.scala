package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Expression microbenchmark: the native Catalyst expressions vs the
  * higher-order-function pipelines they replaced, per-row work identical
  * by construction (the equality specs prove it). Usage:
  *   runMain graft.tools.MicroBench [rows]
  * Emits one JSON line per variant (median of 3 runs after warmup). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)

    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.1", "documents").limit(n)
      .select($"doc_id", $"text").cache()
    docs.count()
    val embs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.1", "embeddings")
      .select($"vec_id", $"embedding").cache()
    embs.count()

    val hofShingles =
      """array_distinct(transform(
        |  CASE WHEN size(split(lower(text), ' ')) >= 3 THEN
        |    transform(sequence(1, size(split(lower(text), ' ')) - 2), i ->
        |      concat(element_at(split(lower(text), ' '), i), ' ',
        |             element_at(split(lower(text), ' '), i + 1), ' ',
        |             element_at(split(lower(text), ' '), i + 2)))
        |  ELSE array(lower(text)) END,
        |  x -> CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT) % 1000000007))"""
        .stripMargin
    val hofCosine =
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v) / " +
        "(sqrt(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)) * " +
        "sqrt(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)))"

    val pairs = embs.select($"vec_id".as("ai"), $"embedding".as("a"))
      .crossJoin(embs.select($"vec_id".as("bi"), $"embedding".as("b")))
      .filter($"ai" < 200 && $"bi" < 200)

    def time(label: String)(thunk: => Long): Unit = {
      thunk // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"bench":"$label","median_sec":${ts(1)}%.3f}""")
    }

    time("shingle_hof") {
      docs.select(expr(hofShingles).as("h")).selectExpr("sum(size(h))")
        .first().getLong(0)
    }
    time("shingle_native") {
      docs.select(graft.functions.VectorFunctions.shingleHashes($"text").as("h"))
        .selectExpr("sum(size(h))").first().getLong(0)
    }
    time("cosine_hof") {
      pairs.select(expr(hofCosine).as("c")).selectExpr("count(c)")
        .first().getLong(0)
    }
    time("cosine_native") {
      pairs.select(graft.functions.VectorFunctions.cosine($"a", $"b").as("c"))
        .selectExpr("count(c)").first().getLong(0)
    }

    val words = docs
      .select(explode(split(lower($"text"), " ")).as("w"))
      .select(regexp_replace($"w", "[^a-z0-9]", "").as("word"))
      .filter(length($"word") > 0).cache()
    words.count()
    time("bpe_replace_chain") {
      words.select(graft.operators.TextOps.bpeEncodeSql($"word").as("t"))
        .selectExpr("sum(size(t))").first().getLong(0)
    }
    time("bpe_native") {
      words.select(graft.operators.TextOps.bpeEncode($"word").as("t"))
        .selectExpr("sum(size(t))").first().getLong(0)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B microbench for the ANN argmax hot path: `max(struct(csim, -cid))`
  * (struct-ordered aggregate buffer) vs an order-equivalent encoded
  * BIGINT `max` (primitive codegen buffer), and the vector-riding forms
  * `max(struct(csim, -cid, e))` vs `max_by(e, key) + max(key)`.
  * Usage: runMain graft.tools.ArgmaxBench [nVecs] [k]. */
object ArgmaxBench {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(30000)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    // the encoded-BIGINT key packs cid into 11 bits: above 2047 the keys
    // collide and the decoded cells are silently wrong (r16 ADVICE)
    require(k <= 2047, s"k=$k overflows the 2048-slot cid encoding")
    val spark = SparkSession.builder()
      .master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)

    // n rows of 4-dim vectors x k broadcast centroids — the pqAssign shape
    val n = spark.range(nVecs.toLong).select($"id".as("vec_id"),
      array((0 until 4).map(i => (rand(i) * 2 - 1)): _*).as("e"))
      .cache()
    n.count()
    val cent = spark.range(k.toLong).select(($"id" + 1).as("cid"),
      array((0 until 4).map(i => (rand(100 + i) * 2 - 1)): _*).as("ce"))
      .cache()
    cent.count()

    val joined = n.crossJoin(broadcast(cent))
      .withColumn("csim",
        graft.Det.round6(graft.functions.VectorFunctions.cosine($"e", $"ce")))
    // quantize the SAME round6-ed csim the struct arm compares, so both
    // arms argmax identical keys and tie-breaking can't diverge
    // (r16 ADVICE); round6 output is exactly representable at 1e-6
    // steps so the *1e6 round-trip is lossless
    val csimq = floor(
      graft.Det.round6(graft.functions.VectorFunctions.cosine($"e", $"ce"))
        * lit(1000000.0) + lit(0.5)).cast("long")
    val keyL = (csimq + lit(2000000L)) * lit(2048L) + (lit(2048L) - $"cid")
    val joinedK = n.crossJoin(broadcast(cent)).withColumn("k", keyL)

    def time(label: String)(thunk: => Long): Unit = {
      thunk
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"bench":"$label","median_sec":${ts(1)}%.3f}""")
    }

    time("argmax_struct") {
      joined.groupBy($"vec_id")
        .agg(max(struct($"csim".as("cs"), (-$"cid").as("nc"))).as("m"))
        .select($"vec_id", (-$"m.nc").as("cell"))
        .selectExpr("sum(cell)").first().getLong(0)
    }
    time("argmax_long") {
      joinedK.groupBy($"vec_id").agg(max($"k").as("k"))
        .select($"vec_id", (lit(2048L) - ($"k" % 2048L)).as("cell"))
        .selectExpr("sum(cell)").first().getLong(0)
    }
    time("argmax_struct_vec") {
      joined.groupBy($"vec_id")
        .agg(max(struct($"csim".as("cs"), (-$"cid").as("nc"), $"e".as("e")))
          .as("m"))
        .select((-$"m.nc").as("cell"), $"m.e".as("e"))
        .selectExpr("sum(cell + size(e))").first().getLong(0)
    }
    time("argmax_maxby_vec") {
      joinedK.groupBy($"vec_id")
        .agg(max_by($"e", $"k").as("e"), max($"k").as("k"))
        .select((lit(2048L) - ($"k" % 2048L)).as("cell"), $"e")
        .selectExpr("sum(cell + size(e))").first().getLong(0)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage decomposition of q_reference_decisions (r10 verdict item 3):
  * times each cumulative prefix of the pipeline so the quiet-entry cost
  * can be attributed to a stage instead of guessed at. Run:
  * `sbt "runMain graft.tools.DecisionsProfile /root/testdata/sf0.1"`. */
object DecisionsProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    def time(label: String)(df: => DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[prof] $label pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

    def hub = graft.operators.ReferencePipeline.decisionsLineitemHub(spark, dir)
    def blocks = graft.operators.Assembly.blocksFrom(hub)
      .withColumn("block_id", col("doc_id") * 8 + col("ord"))
      .drop("doc_id", "ord")
    def bridge = hub.select(
      col("l_orderkey").as("dec_id"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("block_id"),
      (lit(8) - col("l_linenumber")).as("ord"))
    def pieces = bridge.alias("m")
      .join(blocks.alias("b"), col("m.block_id") === col("b.block_id"))
      .withColumn("piece", graft.operators.Assembly.piece(col("b.numbering"),
        col("b.para_text"), col("b.table_caption"), col("b.table_cells")))
      .select(col("m.dec_id").as("doc_id"), col("m.ord").as("ord"), col("piece"))
    def assembled = graft.operators.Assembly.assemble(pieces)
    def decisions = graft.sources.Tables.load(spark, dir, "orders").select(
      col("o_orderkey").as("doc_id"),
      concat((col("o_custkey") % 199).cast("string"), lit("/CP.26")).as("symbol"))
    def joined = decisions.join(assembled, Seq("doc_id"), "inner")
    def deduped = {
      val w = Window.partitionBy(col("symbol")).orderBy(col("doc_id").desc)
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id").as("id"), col("symbol"), col("doc_text").as("text"))
    }

    def hasBlocks = bridge
      .join(blocks.select(col("block_id")), Seq("block_id"), "left_semi")
      .select(col("dec_id").as("doc_id"))
    def winners = decisions.join(hasBlocks, Seq("doc_id"), "left_semi")
      .groupBy(col("symbol")).agg(max(col("doc_id")).as("doc_id"))

    time("1_hub_scan")(hub)
    time("2_bridge_join_blocks")(pieces)
    time("3_assemble")(assembled)
    time("4_join_decisions")(joined)
    time("5_dedup_window")(deduped)
    time("5b_eligibility_semi")(hasBlocks)
    time("5c_winners")(winners)
    time("5d_winner_assembly") {
      val w = winners.localCheckpoint(true)
      w.join(graft.operators.Assembly.assemble(
          pieces.join(broadcast(w.select(col("doc_id"))),
            Seq("doc_id"), "left_semi")),
        Seq("doc_id"), "inner")
    }
    time("6a_pipeline_plain_hub")(
      graft.operators.ReferencePipeline.referenceDecisionsFrom(spark, dir, hub))
    time("6b_pipeline_persisted_hub") {
      val (h, rel) = graft.Exec.sizedHub(hub, factRows = Long.MaxValue)
      try {
        val r = graft.operators.ReferencePipeline
          .referenceDecisionsFrom(spark, dir, h).localCheckpoint(true)
        r
      } finally rel()
    }
    time("6_full_query")(
      graft.SparkEntry.queries("q_reference_decisions")(spark, dir))
    spark.stop()
  }
}

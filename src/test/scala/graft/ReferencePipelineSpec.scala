package graft

import graft.operators.{Llm, ReferencePipeline}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end replay of the reference's two entry points over the
  * FIXTURES.md reference-shaped tables, asserting the exact assembled
  * text each pipeline feeds the model and the §2.13 semantics
  * (body filter, bridge ordering, last-write-wins keying). */
class ReferencePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def fixtures() = {
    import spark.implicits._
    val docs = Seq(
      (1L, "FCCC/SBI/2024/1", "SBI"),
      (2L, "FCCC/SBSTA/2024/7", "SBSTA"),
      (3L, "FCCC/COP/2024/2", "COP"),      // filtered out (not SBI/SBSTA)
      (4L, "FCCC/SBI/2024/1", "SBI"))      // duplicate symbol, higher id wins
      .toDF("doc_id", "symbol", "body_symbol")
    val blocks = Seq(
      // doc 1: numbered paragraph + table with caption (out of order)
      (11L, 1L, 2, null, null, "Tab 1", "c1 c2"),
      (10L, 1L, 1, "1.", "First para", null, null),
      // doc 2: paragraph without numbering
      (20L, 2L, 1, null, "Solo para", null, null),
      // doc 3: would assemble, but its body is filtered
      (30L, 3L, 1, "9.", "Hidden", null, null),
      // doc 4: the duplicate-symbol winner
      (40L, 4L, 1, null, "Winner text", null, null))
      .toDF("block_id", "doc_id", "ord", "numbering", "para_text",
        "table_caption", "table_cells")
    (docs, blocks)
  }

  test("conclusions pipeline: filter, grammar, dedup, symbol-prefixed prompt") {
    import spark.implicits._
    val (docs, blocks) = fixtures()
    val out = ReferencePipeline
      .conclusionsSummaries(spark, docs, blocks, new Llm.StubClient)
      .as[(String, String)].collect().toSeq
    // doc 3 (COP) excluded; symbol FCCC/SBI/2024/1 deduped to doc 4
    assert(out.map(_._1) == Seq("FCCC/SBI/2024/1", "FCCC/SBSTA/2024/7"))
    // stub summary = first 8 tokens of the assembled text + token count;
    // doc 4 text = "Winner text\n" -> tokens "Winner","text"
    assert(out(0)._2 == "Winner text\n … (2 tokens)")
    assert(out(1)._2 == "Solo para\n … (2 tokens)")
  }

  test("decisions pipeline: bridge order wins, bare-text prompt") {
    import spark.implicits._
    val (_, blocks) = fixtures()
    val decisions = Seq((100L, "1/CMA.1")).toDF("dec_id", "symbol")
    // bridge reverses the blocks' own ord: block 11 (table) first
    val bridge = Seq((100L, 11L, 1), (100L, 10L, 2))
      .toDF("dec_id", "block_id", "ord")
    val out = ReferencePipeline
      .decisionsSummaries(spark, decisions, bridge, blocks, new Llm.StubClient)
      .as[(String, String)].collect().toSeq
    assert(out.map(_._1) == Seq("1/CMA.1"))
    // assembled text = "Tab 1\nc1 c2\n" + "1.\tFirst para\n" (bridge order);
    // bare-text prompt -> the stub summarizes from the first token on
    assert(out.head._2.startsWith("Tab 1\nc1 c2\n1.\tFirst"))
  }

  private val dir = "/root/testdata/sf0.001"

  test("decisions hub routes agree bit for bit (recompute vs persisted)") {
    // Collect the RECOMPUTE route first — once the persisted hub exists,
    // CacheManager would substitute InMemoryRelation into any matching
    // subtree and make the recompute side vacuous (the ExecSpec lesson).
    val plain = ReferencePipeline.referenceDecisionsFrom(spark, dir,
      ReferencePipeline.decisionsLineitemHub(spark, dir)).collect().toSeq
    val (hub, release) = Exec.sizedHub(
      ReferencePipeline.decisionsLineitemHub(spark, dir),
      factRows = Long.MaxValue)
    try {
      val cached = ReferencePipeline.referenceDecisionsFrom(spark, dir, hub)
        .collect().toSeq
      assert(plain == cached, "hub routes diverged")
    } finally release()
  }

  test("persist route reads lineitem ONCE: consumers scan the cached hub") {
    // The r9 verdict wart: blocks AND bridge both derive from lineitem,
    // so the unpersisted fixture plan reads it twice. On the production
    // (persist) route both derivations must consume InMemoryRelation —
    // zero lineitem file scans outside the one cache materialization.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val (hub, release) = Exec.sizedHub(
      ReferencePipeline.decisionsLineitemHub(spark, dir),
      factRows = Long.MaxValue)
    try {
      hub.count() // materialize the single lineitem read
      val df = ReferencePipeline.referenceDecisionsFrom(spark, dir, hub)
      var (liScans, memScans) = (0, 0)
      def walk(n: SparkPlan): Unit = {
        n match {
          case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
          case f: FileSourceScanExec =>
            if (f.relation.location.rootPaths.exists(
              _.getName == "lineitem.parquet")) liScans += 1
          case m: InMemoryTableScanExec => memScans += 1
          case _ =>
        }
        n.children.foreach(walk)
        n.subqueries.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      assert(liScans == 0,
        s"persist route must not re-scan lineitem (saw $liScans)")
      assert(memScans >= 2,
        s"both derivations must read the cached hub (saw $memScans)")
    } finally release()
  }
}

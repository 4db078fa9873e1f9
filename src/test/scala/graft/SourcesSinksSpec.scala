package graft

import graft.sources.{Sinks, Tables}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S2 catalog introspection + S4/S6 sink round-trips (SURVEY.md §2.1). */
class SourcesSinksSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("catalog: registerAll + listTables mirrors probe.py") {
    val registered = Tables.registerAll(spark, TestSession.sfDir)
    val listed = Tables.listTables(spark)
    assert(registered.toSet.subsetOf(listed.toSet))
    assert(registered.size == 10)
  }

  test("CSV sink round-trips the flagship result") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_csv").toString
    val df = operators.Assembly.qDocAssembly(spark, TestSession.sfDir).limit(50)
    Sinks.writeCsv(df, out)
    // doc_text embeds newlines; Spark quotes them on write, so the read
    // side needs multiLine to reassemble records
    val back = spark.read.option("header", "true")
      .option("multiLine", "true").csv(out)
    assert(back.count() == 50)
    assert(back.columns.toSeq == Seq("doc_id", "doc_text"))
  }

  test("JSONL sink round-trips every documents row byte-for-byte") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.load(spark, TestSession.sfDir, "documents")
    Sinks.writeJsonl(docs, out)
    val back = spark.read.schema(docs.schema).json(out)
    // row-level fidelity including free text — exceptAll both ways empty
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("Parquet sink round-trips exactly") {
    val out = Files.createTempDirectory("graft_pq").toString
    val df = SparkEntry.queries("q_agg_hash")(spark, TestSession.sfDir)
    Sinks.writeParquet(df, out)
    val back = spark.read.parquet(out)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("schema evolution: unionByName reconciles drifted batch schemas") {
    // the ingestion reality at 100 TB: yesterday's landed files lack a
    // column today's carry (and vice versa); unionByName with
    // allowMissingColumns is the reconciliation step, null-filling by
    // NAME (a positional union would silently misalign)
    import spark.implicits._
    val old = Seq((1L, "en")).toDF("doc_id", "lang")
    val nuw = Seq((2L, "web", 0.9)).toDF("doc_id", "source", "quality")
    val all = old.unionByName(nuw, allowMissingColumns = true)
    assert(all.columns.toSeq == Seq("doc_id", "lang", "source", "quality"))
    val rows = all.orderBy($"doc_id")
      .as[(Long, Option[String], Option[String], Option[Double])].collect()
    assert(rows.toSeq == Seq(
      (1L, Some("en"), None, None),
      (2L, None, Some("web"), Some(0.9))))
    // and the reconciled frame lands + reads back with the wide schema
    val out = Files.createTempDirectory("graft_evolve").toString
    Sinks.writeParquet(all, out)
    assert(spark.read.parquet(out).columns.sorted.toSeq ==
      all.columns.sorted.toSeq)
  }
}

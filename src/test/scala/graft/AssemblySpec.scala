package graft

import graft.operators.Assembly
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A3 concat-grammar fidelity (SURVEY.md §7.5.2): the full 16-case null
  * lattice of (numbering, para_text, table_caption, table_cells) from the
  * reference's branch structure
  * (`/root/reference/decisions-summaries/generate_conclusions_summaries.py:52-66`),
  * plus ordered-assembly semantics. */
class AssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Scala replica of the §2.13.4 grammar. `cells` is NOT stripped — the
    * reference appends cells_text raw (only numbering/caption/paragraph
    * get `.strip()`, generate_conclusions_summaries.py:64). */
  private def expected(num: Option[String], para: Option[String],
                       cap: Option[String], cells: Option[String]): String =
    para match {
      case Some(p) => num.map(n => n.trim + "\t").getOrElse("") + p.trim + "\n"
      case None => cells match {
        case Some(c) => cap.map(x => x.trim + "\n").getOrElse("") + c + "\n"
        case None => ""
      }
    }

  test("piece grammar covers the full 16-case null lattice") {
    import spark.implicits._
    val opts = Seq(None, Some(" x1 "))
    val cases = for {
      num <- opts.map(_.map("1." + _))
      para <- opts.map(_.map("para" + _))
      cap <- opts.map(_.map("cap" + _))
      cells <- opts.map(_.map("cells" + _))
    } yield (num, para, cap, cells)
    val df = cases.zipWithIndex.map { case ((n, p, c, ce), i) =>
      (i.toLong, n.orNull, p.orNull, c.orNull, ce.orNull)
    }.toDF("id", "numbering", "para_text", "table_caption", "table_cells")
    val got = df.withColumn("piece",
        Assembly.piece($"numbering", $"para_text", $"table_caption", $"table_cells"))
      .orderBy($"id").select($"piece").as[String].collect()
    val want = cases.map { case (n, p, c, ce) => expected(n, p, c, ce) }
    assert(got.toSeq == want)
  }

  test("assemble concatenates pieces in ord order regardless of row order") {
    import spark.implicits._
    val blocks = Seq(
      (1L, 3, "c\n"), (1L, 1, "a\n"), (1L, 2, "b\n"),
      (2L, 1, "z\n"))
      .toDF("doc_id", "ord", "piece")
      .repartition(4) // scramble physical order
    val got = Assembly.assemble(blocks).orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a\nb\nc\n"), (2L, "z\n")))
  }

  test("typed Aggregator assembly == Column assembly on real blocks") {
    import spark.implicits._
    val b = Assembly.blocksFromLineitem(spark, TestSession.sfDir)
      .withColumn("piece", Assembly.piece($"numbering", $"para_text",
        $"table_caption", $"table_cells"))
      .select($"doc_id", $"ord", $"piece")
    val col = Assembly.assemble(b).orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    val typed = Assembly.assembleTyped(b).orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    assert(typed == col)
  }

  test("flagship q_doc_assembly returns one text per order on sf0.001") {
    val out = Assembly.qDocAssembly(spark, TestSession.sfDir)
    val n = out.count()
    val nOrders = graft.sources.Tables
      .load(spark, TestSession.sfDir, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(n == nOrders && n > 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The layout property q_compact_files's hash gate cannot see: the
  * fragment→compact rewrite must actually collapse the file count AND
  * cluster the key space (disjoint per-file key ranges = file-level
  * data skipping for key-range readers). */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  private def dataFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction collapses 64 fragments into 4 clustered files, losslessly") {
    import spark.implicits._
    val compacted = operators.Layouts.lineitemCompacted(spark, dir)
    val nFrag = dataFiles(operators.Layouts.fragPath(dir)).length
    val nComp = dataFiles(operators.Layouts.compactPath(dir)).length
    assert(nFrag == 64, s"fragmented layout should have 64 files, saw $nFrag")
    assert(nComp <= 4, s"compacted layout should have <=4 files, saw $nComp")

    // row-identical with the source (count + id-multiset checksum)
    val src = graft.sources.Tables.load(spark, dir, "lineitem")
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      df.agg(count(lit(1)), sum($"l_orderkey" * 7919L + $"l_linenumber"))
        .as[(Long, Long)].head()
    assert(sig(compacted) == sig(src), "compaction dropped or altered rows")

    // clustering: per-file orderkey ranges are disjoint (touching only at
    // a range-partition boundary key)
    val spans = compacted
      .select(input_file_name().as("f"), $"l_orderkey")
      .groupBy($"f")
      .agg(min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi"))
      .orderBy($"lo")
      .as[(String, Long, Long)].collect()
    spans.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, s"file key ranges overlap: hi=$hi1 > lo=$lo2")
      case _ =>
    }
  }
}

package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** The train-once/search-many contract behind q_ann_search_indexed:
  * the IVF-PQ index artifact is written once per corpus and reused, the
  * search plan contains NO training subtree (the corpus's raw
  * embeddings are only read for the |Q|-row query slice), and searching
  * the stored index returns bit-identical rows to the retrain-per-run
  * q_ann_ivfpq composition. */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def scanCounts(name: String): Map[String, Int] = {
    val df = Exec.withLazyPlans(SparkEntry.queries(name)(spark, dir))
    val buf = scala.collection.mutable.Buffer[String]()
    def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
        case f: FileSourceScanExec =>
          buf ++= f.relation.location.rootPaths.map(_.getName)
        case _ =>
      }
      n.children.foreach(walk)
      n.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    buf.groupBy(identity).view.mapValues(_.size).toMap
  }

  test("index artifact is written once and reused (_SUCCESS guard)") {
    SparkEntry.queries("q_ann_search_indexed")(spark, dir).count()
    val root = new java.io.File(operators.Similarity.annIndexPath(dir))
    val parts = Seq("coarse", "cells", "pq", "codes")
    parts.foreach { p =>
      assert(new java.io.File(root, s"$p/_SUCCESS").exists(),
        s"index part $p missing")
    }
    val mtimes = parts.map(p => new java.io.File(root, s"$p/_SUCCESS")
      .lastModified())
    SparkEntry.queries("q_ann_search_indexed")(spark, dir).count()
    val again = parts.map(p => new java.io.File(root, s"$p/_SUCCESS")
      .lastModified())
    assert(mtimes == again, "second run must NOT rebuild the index")
  }

  test("search plan reads the index, never a training subtree") {
    // build the artifact first so the lazy plan is the steady state
    SparkEntry.queries("q_ann_search_indexed")(spark, dir).count()
    val scans = scanCounts("q_ann_search_indexed")
    // the raw corpus appears only as the query-slice reads (q + its
    // PQ-subspace view share the scan twice in the lazy tree); the
    // retraining composition plans 16 of them (q_ann_ivfpq's pin)
    assert(scans.getOrElse("embeddings.parquet", 0) <= 3,
      s"search must not retrain over the corpus: $scans")
    Seq("coarse", "cells", "pq", "codes").foreach { p =>
      assert(scans.getOrElse(p, 0) >= 1, s"index part $p not read: $scans")
    }
  }

  test("stored-index search ≡ retrain-per-run composition, bit-exact") {
    val a = SparkEntry.queries("q_ann_search_indexed")(spark, dir)
      .collect().toSeq
    val b = SparkEntry.queries("q_ann_ivfpq")(spark, dir)
      .collect().toSeq
    assert(a == b, "search over the stored index diverged from retrain")
  }
}

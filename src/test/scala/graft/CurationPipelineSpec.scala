package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capstone composition: the declared queries are not just individually
  * oracle-correct — they COMPOSE into the standard pretraining curation
  * pipeline (quality filter → exact dedup → near-dup drop → split), with
  * the row accounting and disjointness a real run needs. This is the
  * "switch your pipeline to this library" claim, exercised end to end. */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("filter -> dedup -> near-dup -> split composes with exact accounting") {
    import spark.implicits._
    val total = graft.sources.Tables.load(spark, dir, "documents").count()

    // stage 1: model-based quality filter (keep = exact z>=0 cut)
    val kept = q("q_classifier_score").filter($"keep").select($"doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // stage 2: exact dedup (smallest doc_id per sha256(text) survives)
    val canonical = q("q_dedup_exact").select($"doc_id")
    val exactDeduped = kept.join(canonical, "doc_id")
    val nExact = exactDeduped.count()
    assert(nExact <= nKept)

    // stage 3: near-dup drop — for every confirmed MinHash pair (a < b)
    // drop the larger id; the kept side of each pair must survive intact
    val pairs = q("q_dedup_minhash_lsh").select($"a", $"b")
    val drops = pairs.select($"b".as("doc_id")).distinct()
    val surviving = exactDeduped.join(drops, Seq("doc_id"), "left_anti")
    val nSurv = surviving.count()
    assert(nSurv == nExact - exactDeduped.join(drops, "doc_id").count(),
      "anti-join must remove exactly the flagged near-dups present")
    val keptSides = pairs.select($"a".as("doc_id")).distinct()
      .join(drops, Seq("doc_id"), "left_anti") // a-side ids never dropped
    assert(keptSides.join(exactDeduped, "doc_id").count() ==
      keptSides.join(surviving, "doc_id").count(),
      "the kept side of each near-dup pair must survive stage 3")

    // stage 3b: exact-substring dedup (round 4) — the verbatim-run class
    // set-based MinHash misses; same drop-the-larger-id policy, composed
    // on the stage-3 survivors
    val runPairs = q("q_substring_dedup").select($"doc_a", $"doc_b")
    val runDrops = runPairs.select($"doc_b".as("doc_id")).distinct()
    val afterRuns = surviving.join(runDrops, Seq("doc_id"), "left_anti")
    val nRuns = afterRuns.count()
    assert(nRuns == nSurv - surviving.join(runDrops, "doc_id").count(),
      "substring-dedup stage must remove exactly the flagged run-pairs present")

    // stage 3c: embedding-coherence cut (round 4) — drop documents whose
    // vector sits "below" its label centroid (coherence < 0), the
    // prototype-distance mislabel/OOD filter; vec_id aligns with doc_id
    // in the testdata. Composes by the same anti-join accounting.
    val lowCoherence = q("q_embed_coherence")
      .filter($"coherence" < 0.0)
      .select($"vec_id".as("doc_id"))
    val afterCoherence = afterRuns.join(lowCoherence, Seq("doc_id"), "left_anti")
    assert(afterCoherence.count() ==
      nRuns - afterRuns.join(lowCoherence, "doc_id").count(),
      "coherence stage must remove exactly the flagged low-coherence docs")
    assert(afterCoherence.count() > 0, "coherence cut must not empty the corpus")

    // stage 4: stable split assignment partitions the survivors
    val split = q("q_split_assign")
    val withSplit = surviving.join(split, "doc_id")
    assert(withSplit.count() == nSurv, "every survivor gets exactly one split")
    val bySplit = withSplit.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == nSurv)
    // train dominates under the 90/5/5 hash split
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))

    // determinism: the whole composed pipeline reproduces the same set
    val again = q("q_classifier_score").filter($"keep").select($"doc_id")
      .join(canonical, "doc_id")
      .join(drops, Seq("doc_id"), "left_anti")
    assert(again.exceptAll(surviving).isEmpty &&
      surviving.exceptAll(again).isEmpty,
      "pipeline must be content-deterministic end to end")
  }
}

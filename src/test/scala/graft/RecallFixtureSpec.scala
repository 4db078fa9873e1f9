package graft

import graft.tools.PlantedFixture
import org.scalatest.funsuite.AnyFunSuite

/** PLANTED-CLUSTER recall gates (round 13, verdict item 5): the driver
  * fixture's embeddings are near-random, so on them the PQ and LSH
  * recall gates read ≈0 and their knob sweeps could only conclude
  * "don't bother" — honest, but non-discriminating. This spec runs the
  * SAME production search paths over a corpus with real neighborhood
  * structure ([[PlantedFixture]]: 50 md5-seeded cluster means, 4000
  * noisy members, fully deterministic — thresholds cannot flake) and
  * pins the separations the random fixture could never show:
  *
  *   - IVF at the probe-pinned defaults (C=⌈√N⌉, nprobe=C/2) finds
  *     essentially everything — and DROPPING nprobe visibly costs
  *     recall, so the knob the round-11/12 probes re-pinned is
  *     demonstrably the operative lever;
  *   - the LSH family, ≈0 on random vectors, reads ≥0.9 on structure —
  *     the bucketer works; the old gate value measured the corpus, not
  *     the code — and it holds at the DEFAULT 8 bits (the cheapest
  *     scanned fraction), evidencing the default;
  *   - the PQ-bits lever finally SEPARATES (recall rises with codes
  *     per subspace) while remaining far below IVF-flat — structured
  *     evidence that subspace distortion, not probing and not fixture
  *     randomness, is what binds tiny-codebook ADC ranking. The
  *     round-16 (M, K) grid then swept BOTH geometry axes and
  *     re-pinned the defaults to the measured winner (M=16, K=64:
  *     0.25 here, 0.37 on the sf corpus — vs 0.02/0.04 at the old
  *     (4, 8)).
  *
  * Measured by tools.RecallProbe on this exact corpus (round 13 at
  * M=4; round 16 grid in PLANS.md): ivf(63,31)=1.00, ivf(63,2)=0.78,
  * lsh(8)=0.965, pq(m=4,k=8)=0.02, pq(m=4,k=64)=0.19,
  * pq(m=16,k=64)=0.25. Assertions leave slack but would catch any
  * real regression in the candidate-generation or ranking paths. */
class RecallFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val planted = {
    val v = PlantedFixture.vectors(spark, n = 4000, k = 50)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    v.count()
    v
  }
  private lazy val exact = {
    val e = PlantedFixture.bruteTop5(planted)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    e
  }
  test("IVF at the pinned defaults finds the planted structure; nprobe is the lever") {
    import spark.implicits._
    val rootC = math.sqrt(4000.0).round.toInt // 63
    val full = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.ivfRanked(spark,
        planted.select($"vec_id", $"e"), rootC, 2, math.max(1, rootC / 2)))
    val narrow = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.ivfRanked(spark,
        planted.select($"vec_id", $"e"), rootC, 2, 2))
    assert(full >= 0.95, f"IVF(√N, C/2) on planted clusters: $full%.3f")
    assert(narrow <= full - 0.1,
      f"dropping nprobe to 2 must visibly cost recall: $narrow%.3f vs $full%.3f")
  }

  test("LSH reads >=0.9 on structure at the default 8 bits (the gate measured the corpus, not the code)") {
    import spark.implicits._
    val r = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.lshRankedOn(spark,
        planted.select($"vec_id", $"embedding"),
        graft.operators.Similarity.LshDefaultBits))
    assert(r >= 0.9, f"LSH@8bits on planted clusters: $r%.3f")
  }

  test("the PQ-bits lever separates on structure; distortion, not probing, binds ADC") {
    import spark.implicits._
    val rootC = math.sqrt(4000.0).round.toInt
    val np = math.max(1, rootC / 2)
    val pq8 = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.ivfPqRanked(spark,
        planted.select($"vec_id", $"e"), rootC, np, 8))
    val pq64 = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.ivfPqRanked(spark,
        planted.select($"vec_id", $"e"), rootC, np, 64))
    assert(pq64 >= pq8 + 0.05,
      f"codes-per-subspace must be a measurable lever on structure: " +
        f"pq8=$pq8%.3f pq64=$pq64%.3f")
    assert(pq64 <= 0.6,
      f"tiny-codebook ADC stays far below flat even on structure " +
        f"(distortion binds): $pq64%.3f")
  }

  test("exact re-rank of the ADC top-r recovers near-flat recall (the production refinement)") {
    import spark.implicits._
    val rootC = math.sqrt(4000.0).round.toInt
    val np = math.max(1, rootC / 2)
    val adc = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.ivfPqRanked(spark,
        planted.select($"vec_id", $"e"), rootC, np, 8))
    // below the knee: r=50 against ~80-member clusters reads ≈ the
    // hypergeometric 50/80 of a random within-cluster cut — evidence
    // that r must exceed the densest neighborhood ADC cannot order
    val below = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.ivfPqRerankRanked(spark,
        planted.select($"vec_id", $"e"), rootC, np, 8, 50))
    val rr = PlantedFixture.recallAt5(exact,
      graft.operators.Similarity.ivfPqRerankRanked(spark,
        planted.select($"vec_id", $"e"), rootC, np, 8,
        graft.operators.Similarity.RerankR))
    info(f"planted recall@5: adc-only=$adc%.3f rerank(r=50)=$below%.3f " +
      f"rerank(r=${graft.operators.Similarity.RerankR})=$rr%.3f")
    assert(rr >= 0.9,
      f"ADC top-r + exact re-rank on planted clusters: $rr%.3f")
    assert(rr >= adc + 0.5,
      f"the re-rank stage must recover what ADC distortion loses: " +
        f"adc=$adc%.3f rerank=$rr%.3f")
    assert(rr >= below + 0.2,
      f"r is a measured lever: below-knee r=50 must visibly trail the " +
        f"pinned default: $below%.3f vs $rr%.3f")
  }
}

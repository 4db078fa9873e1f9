package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** [[Exec.sizedHub]] routing: the cost-routed hub must persist exactly
  * when the fact size exceeds the threshold, release must be an
  * unpersist iff persisted, and — the property every caller relies on —
  * both physical routes must return bit-identical rows (the hub is
  * deterministic, so recompute-per-consumer and cached-once agree). */
class ExecSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def hubDf = {
    import spark.implicits._
    (1 to 1000).map(i => (i.toLong, s"t${i % 97}")).toDF("id", "tok")
      .groupBy($"tok").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
  }

  test("small facts route to recompute (no persist)") {
    val (hub, release) = Exec.sizedHub(hubDf, factRows = 10L, threshold = 100L)
    assert(hub.storageLevel == StorageLevel.NONE)
    release() // must be a no-op, not an error
    assert(hub.storageLevel == StorageLevel.NONE)
  }

  test("large facts route to a persisted hub; release unpersists") {
    val (hub, release) = Exec.sizedHub(hubDf, factRows = 1000L, threshold = 100L)
    assert(hub.storageLevel == StorageLevel.MEMORY_AND_DISK)
    hub.count()
    release()
    assert(hub.storageLevel == StorageLevel.NONE)
  }

  test("both routes yield bit-identical results") {
    // Order matters: collect the recompute route BEFORE the persisted
    // route exists — CacheManager substitutes InMemoryRelation into any
    // later plan whose canonical subtree matches, which would make the
    // "recompute" side silently read the cache and the test vacuous.
    val (small, rs) = Exec.sizedHub(hubDf, factRows = 1L, threshold = 100L)
    val a = small.orderBy("tok").collect().toSeq
    rs()
    val (big, rb) = Exec.sizedHub(hubDf, factRows = 1000L, threshold = 100L)
    try {
      val b = big.orderBy("tok").collect().toSeq
      assert(a == b)
    } finally rb()
  }

  test("probe is lazy: the fast route must not evaluate a persisted side") {
    // factRows is by-name so the (memoized) count job runs once per
    // call site, not once per route consideration
    var evals = 0
    def probe: Long = { evals += 1; 1L }
    Exec.sizedHub(hubDf, probe, threshold = 100L)
    assert(evals == 1)
  }
}

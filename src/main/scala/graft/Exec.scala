package graft

import org.apache.spark.sql.DataFrame

/** Result-lifecycle seam for declared queries.
  *
  * Most multi-pass operators persist a fact-derived intermediate, build a
  * SMALL result, then eagerly `localCheckpoint` that result so the
  * intermediate can be unpersisted before the function returns (the
  * caller — Verify / Bench — would otherwise recompute the unpersisted
  * lineage on every action). The cost of that pattern is an opaque
  * `RDDScanExec` plan: plan-shape guards can't see the real operator tree
  * through a checkpoint.
  *
  * [[Exec.seal]] keeps the eager lifecycle for normal runs but lets plan
  * inspection opt OUT via [[Exec.lazyPlans]]: with the flag on, the query
  * function returns the un-checkpointed DataFrame whose
  * `queryExecution` is the genuine plan (persist/unpersist become no-ops
  * for plan purposes — the lineage is still correct, merely uncached).
  * Tests flip the flag around a whole-registry sweep (PlanShapeSpec);
  * production paths never touch it. Every declared query is
  * deterministic by construction ([[Det]] discipline), so executing the
  * lazy form yields bit-identical rows to the sealed form.
  */
object Exec {

  /** When true, [[seal]] skips the eager localCheckpoint so
    * `df.queryExecution` exposes the real operator tree. Test-only. */
  @volatile private[graft] var lazyPlans: Boolean = false

  /** Seal a query result: eager localCheckpoint in normal runs (so
    * persisted intermediates can be released immediately), identity when
    * [[lazyPlans]] is set. */
  def seal(df: DataFrame): DataFrame =
    if (lazyPlans) df else df.localCheckpoint(true)

  /** Run `body` with lazy plan capture enabled; restores the prior mode. */
  private[graft] def withLazyPlans[A](body: => A): A = {
    val prev = lazyPlans
    lazyPlans = true
    try body finally lazyPlans = prev
  }
}

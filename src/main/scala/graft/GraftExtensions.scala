package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomKeysAgg, BloomMightContain, BpeTokens, CmsEstimate, CosineSimilarity, IntersectSize, KmvDistinct, MinHashSig, ShingleHashes, SimHash16, VectorFunctions}

/** SparkSessionExtensions hook: makes the engine's native functions
  * available SQL-wide via `spark.sql.extensions=graft.GraftExtensions`
  * (no per-session registration call needed), and injects the
  * [[graft.plans.RangeBinJoinRule]] optimizer rule (fixed-width interval
  * joins → binned equi-joins; kill-switch
  * `spark.graft.binRangeJoin.enabled=false`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RangeBinJoinRule)
    // OPTIMIZE / VACUUM maintenance statements for DirSink zones
    // (graft.plans.GraftSqlParser); everything else delegates verbatim
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // table_changes('t', from[, to]) — the change data feed as SQL
    e.injectTableFunction((
      FunctionIdentifier(graft.plans.TableChanges.Name),
      new ExpressionInfo(graft.plans.TableChanges.getClass.getName,
        graft.plans.TableChanges.Name),
      (exprs: Seq[Expression]) => graft.plans.TableChanges.plan(exprs)))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.COSINE),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        VectorFunctions.COSINE),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.SHINGLE_HASHES),
      new ExpressionInfo(classOf[ShingleHashes].getName,
        VectorFunctions.SHINGLE_HASHES),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0))))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.MINHASH_SIG),
      new ExpressionInfo(classOf[MinHashSig].getName,
        VectorFunctions.MINHASH_SIG),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0))))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.SIMHASH),
      new ExpressionInfo(classOf[SimHash16].getName,
        VectorFunctions.SIMHASH),
      (exprs: Seq[Expression]) => SimHash16(exprs(0))))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.INTERSECT_SIZE),
      new ExpressionInfo(classOf[IntersectSize].getName,
        VectorFunctions.INTERSECT_SIZE),
      (exprs: Seq[Expression]) => IntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.KMV_DISTINCT),
      new ExpressionInfo(classOf[KmvDistinct].getName,
        VectorFunctions.KMV_DISTINCT),
      (exprs: Seq[Expression]) => KmvDistinct(exprs.head)))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.BPE_TOKENS),
      new ExpressionInfo(classOf[BpeTokens].getName,
        VectorFunctions.BPE_TOKENS),
      (exprs: Seq[Expression]) => BpeTokens(exprs.head)))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.CMS_ESTIMATE),
      new ExpressionInfo(classOf[CmsEstimate].getName,
        VectorFunctions.CMS_ESTIMATE),
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.BLOOM_AGG),
      new ExpressionInfo(classOf[BloomKeysAgg].getName,
        VectorFunctions.BLOOM_AGG),
      (exprs: Seq[Expression]) => BloomKeysAgg(exprs.head)))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.BLOOM_CONTAINS),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        VectorFunctions.BLOOM_CONTAINS),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(VectorFunctions.ARGMAX_VEC),
      new ExpressionInfo(classOf[graft.functions.ArgmaxVec].getName,
        VectorFunctions.ARGMAX_VEC),
      (exprs: Seq[Expression]) =>
        graft.functions.ArgmaxVec(exprs(0), exprs(1), exprs(2))))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** SparkSessionExtensions hook: makes the engine's native functions
  * available SQL-wide via `spark.sql.extensions=graft.GraftExtensions`
  * (no per-session registration call needed). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(graft.functions.VectorFunctions.COSINE),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        graft.functions.VectorFunctions.COSINE),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
  }
}

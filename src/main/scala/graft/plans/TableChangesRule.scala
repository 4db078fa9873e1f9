package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `table_changes('<table or zone path>', from[, to])` — the SQL
  * surface of the change data feed (Delta's TVF vocabulary),
  * registered through `SparkSessionExtensions.injectTableFunction` so
  * it composes with the whole SQL language:
  *
  * {{{
  * SELECT * FROM table_changes('cat.db.docs', 3)
  * SELECT _change_type, count(*) FROM table_changes('/path/zone', 0, 7)
  * GROUP BY 1
  * }}}
  *
  * The first argument resolves as a catalog table name (through the
  * session catalog manager — only graft zones qualify) or, when it
  * looks like a filesystem path, directly as a zone path; the builder
  * returns [[graft.sources.v2.ChangeFeed.read]]'s analyzed plan.
  * Arguments must be literals — the feed's generation range shapes the
  * PLAN (which files of which generations are read), so it cannot be
  * a runtime value. */
object TableChanges {
  val Name = "table_changes"

  private def str(e: Expression): Option[String] = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      Some(v.toString)
    case _ => None
  }

  private def long(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case _ => None
  }

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    def usage = s"$Name('<table or zone path>', fromVersion[, toVersion])" +
      " takes literal arguments — the generation range shapes the plan"
    if (exprs.length < 2 || exprs.length > 3)
      throw new IllegalArgumentException(usage)
    val target = str(exprs.head).getOrElse(
      throw new IllegalArgumentException(usage))
    val from = long(exprs(1)).getOrElse(
      throw new IllegalArgumentException(usage))
    val to = exprs.lift(2).map(e => long(e).getOrElse(
      throw new IllegalArgumentException(usage)))
    val spark = SparkSession.active
    val path =
      if (target.startsWith("/") || target.contains("://")) target
      else ZoneResolve.zonePath(spark,
        spark.sessionState.sqlParser.parseMultipartIdentifier(target))
    graft.sources.v2.ChangeFeed.read(spark, path, from, to)
      .queryExecution.analyzed
  }
}

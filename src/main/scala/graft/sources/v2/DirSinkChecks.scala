package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BindReferences, Coalesce, Expression, Literal, Predicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** CHECK CONSTRAINTS for DirSink zones — the write-path enforcement
  * that makes the table format GOVERNED, not just transactional
  * (Delta's `delta.constraints.*` discipline, carried by the manifest
  * header instead of a transaction log):
  *
  *   - declared as table properties `check.<name> = '<sql predicate>'`
  *     at CREATE (catalog or staged CTAS) or later via `ALTER TABLE …
  *     SET TBLPROPERTIES` — adding one VALIDATES the existing zone
  *     first and refuses if any committed row violates it;
  *   - stored in the `#check` manifest header (name + base64 of the
  *     SQL, so arbitrary predicate text survives the header codec) and
  *     carried forward by every commit like all zone properties;
  *   - enforced on EVERY write path — batch append, streaming epoch,
  *     staged CTAS/RTAS, row-level UPDATE/MERGE rewrite — by binding
  *     the predicate against the write schema ON THE DRIVER (parse →
  *     analyze → bind, so executors receive a self-contained
  *     serializable expression, never SQL text to re-resolve) and
  *     evaluating it per row in front of the file writer. SQL CHECK
  *     semantics: only a row where the predicate is definitively FALSE
  *     violates — NULL passes (`Coalesce(expr, true)` at bind time).
  *
  * A violating write FAILS THE JOB before its commit: the zone's
  * staged-write protocol means no partial data ever publishes — the
  * constraint holds as a zone INVARIANT, not a best-effort filter. At
  * 100 TB this is the difference between discovering a poisoned
  * pipeline at write time and discovering it in a training run. */
object DirSinkChecks {

  /** Manifest header key: `name:<b64 sql>` entries joined by `,`. */
  val Key = "check"
  val PropPrefix = "check."

  def render(checks: Seq[(String, String)]): String =
    checks.map { case (n, sql) =>
      n + ":" + java.util.Base64.getEncoder.encodeToString(
        sql.getBytes("UTF-8"))
    }.mkString(",")

  def parseHeader(header: Map[String, String]): Seq[(String, String)] =
    header.get(Key).toSeq.filter(_.nonEmpty).flatMap(_.split(",").toSeq)
      .map { e =>
        val i = e.indexOf(':')
        (e.substring(0, i), new String(
          java.util.Base64.getDecoder.decode(e.substring(i + 1)), "UTF-8"))
      }

  /** The zone's declared constraints; empty for unconstrained zones. */
  def zoneChecks(path: String): Seq[(String, String)] =
    DirSink.readManifestRaw(path).map(m => parseHeader(m.header))
      .getOrElse(Seq.empty)

  /** Constraint name guard: names become header/property tokens. */
  def checkName(n: String): Unit =
    if (n.isEmpty || !n.forall(c => c.isLetterOrDigit || c == '_'))
      throw new IllegalArgumentException(
        s"constraint name '$n' must be alphanumeric/underscore")

  /** A driver-bound constraint: `expr` is fully resolved and bound to
    * the write schema's field positions — serializable, executor-ready. */
  case class Bound(name: String, sql: String, expr: Expression)
    extends Serializable

  /** DRIVER side: parse + analyze + bind one constraint predicate
    * against `schema`. Fails loudly on unresolvable columns, wrong
    * result type, or non-determinism — at DDL/plan time, never on an
    * executor mid-write. */
  def bind(schema: StructType, name: String, sql: String): Bound = {
    val spark = SparkSession.active
    val attrs = schema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, nullable = true)())
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(sql)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"CHECK constraint $name: cannot parse '$sql': ${e.getMessage}") }
    // Lower to an evaluable form — the analyzer leaves these for the
    // optimizer: ReplaceExpressions unfolds RuntimeReplaceable shapes
    // (BETWEEN, nvl, …) and RewriteWithExpression eliminates the
    // common-subexpression `With` nodes those unfold into
    val analyzed = org.apache.spark.sql.catalyst.optimizer
      .RewriteWithExpression(org.apache.spark.sql.catalyst.optimizer
        .ReplaceExpressions(spark.sessionState.analyzer.execute(
          Filter(parsed, LocalRelation(attrs)))))
    val condition = analyzed match {
      case Filter(c, _) if c.resolved => c
      case _ => throw new IllegalArgumentException(
        s"CHECK constraint $name: '$sql' does not resolve against " +
          s"schema [${schema.toDDL}]")
    }
    if (condition.dataType != org.apache.spark.sql.types.BooleanType)
      throw new IllegalArgumentException(
        s"CHECK constraint $name: '$sql' is ${condition.dataType.sql}, " +
          "not BOOLEAN")
    if (!condition.deterministic)
      throw new IllegalArgumentException(
        s"CHECK constraint $name: '$sql' is non-deterministic — a " +
          "retried task could pass what the first attempt failed")
    // SQL CHECK three-valued law: NULL passes, only FALSE violates
    Bound(name, sql,
      BindReferences.bindReference(
        Coalesce(Seq(condition, Literal(true))), attrs))
  }

  def bindAll(schema: StructType,
              checks: Seq[(String, String)]): Seq[Bound] =
    checks.map { case (n, sql) => bind(schema, n, sql) }

  /** EXECUTOR side: evaluate every constraint in front of the wrapped
    * writer; the first FALSE fails the task (and therefore the job,
    * before any commit). */
  class CheckedWriter(inner: DataWriter[InternalRow], bound: Seq[Bound])
      extends DataWriter[InternalRow] {
    private val preds = bound.map(b => (b, Predicate.create(b.expr)))
    override def write(record: InternalRow): Unit = {
      preds.foreach { case (b, p) =>
        if (!p.eval(record))
          throw new IllegalArgumentException(
            s"CHECK constraint ${b.name} (${b.sql}) violated — the " +
              "write fails before commit; no partial data publishes")
      }
      inner.write(record)
    }
    override def commit(): WriterCommitMessage = inner.commit()
    override def abort(): Unit = inner.abort()
    override def close(): Unit = inner.close()
  }
}

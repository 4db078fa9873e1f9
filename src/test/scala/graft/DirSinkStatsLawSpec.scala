package graft

import graft.sources.v2.DirSinkStats
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized LAW spec for the data-skipping stats (the DELETE path's
  * correctness hinges on these — a wrong `allMatch` silently deletes
  * live rows; a wrong `canSkip` silently drops query results):
  *
  *   SOUNDNESS OF SKIP:   canSkip(f)   ⇒ no row satisfies f
  *   SOUNDNESS OF MATCH:  allMatch(f)  ⇒ every row satisfies f
  *   EXCLUSION:           both true    ⇒ the file is empty
  *
  * 400 seeded-random (dataset, filter) cases per run: mixed types,
  * NULLs, NaNs, empty files, boundary-valued predicates, and And/Or
  * compositions; the reference evaluator implements Spark's SQL
  * three-valued semantics (comparisons and IN never match NULL; NaN
  * sorts above every double; filter keeps only TRUE). Determinism: the
  * seed is fixed, so a failure reproduces exactly. */
class DirSinkStatsLawSpec extends AnyFunSuite {

  private val schema = StructType.fromDDL(
    "a BIGINT, d DOUBLE, s STRING, b BOOLEAN")

  private val rnd = new scala.util.Random(20260815L)

  private def randomRow(): (Option[Long], Option[Double], Option[String],
      Option[Boolean]) = {
    def opt[T](v: => T): Option[T] = if (rnd.nextInt(5) == 0) None else Some(v)
    (opt(rnd.nextInt(20).toLong - 10),
      opt(rnd.nextInt(12) match {
        case 0 => Double.NaN
        case 1 => -0.0 // IEEE-equal to 0.0 in Spark — the bounds must agree
        case 2 => 0.0
        case _ => (rnd.nextInt(40) - 20) / 4.0
      }),
      opt(Seq("", "a", "ab", "b", "ba", "zz", "tab\tx", "é")(rnd.nextInt(8))),
      opt(rnd.nextBoolean()))
  }

  private def internal(r: (Option[Long], Option[Double], Option[String],
      Option[Boolean])): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      r._1.map(Long.box).orNull,
      r._2.map(Double.box).orNull,
      r._3.map(UTF8String.fromString).orNull,
      r._4.map(Boolean.box).orNull))

  private def randomValue(col: String): Any = col match {
    case "a" => rnd.nextInt(24).toLong - 12
    case "d" => rnd.nextInt(14) match {
      case 0 => Double.NaN
      case 1 => -0.0
      case 2 => 0.0
      case _ => (rnd.nextInt(48) - 24) / 4.0
    }
    case "s" => Seq("", "a", "ab", "b", "ba", "zz", "m", "é")(rnd.nextInt(8))
    case "b" => rnd.nextBoolean()
  }

  private def randomFilter(depth: Int): Filter = {
    val col = Seq("a", "d", "s", "b")(rnd.nextInt(4))
    if (depth > 0 && rnd.nextInt(3) == 0) {
      if (rnd.nextBoolean()) And(randomFilter(depth - 1), randomFilter(depth - 1))
      else Or(randomFilter(depth - 1), randomFilter(depth - 1))
    } else rnd.nextInt(10) match {
      case 0 => EqualTo(col, randomValue(col))
      case 1 => GreaterThan(col, randomValue(col))
      case 2 => GreaterThanOrEqual(col, randomValue(col))
      case 3 => LessThan(col, randomValue(col))
      case 4 => LessThanOrEqual(col, randomValue(col))
      case 5 => In(col, Array.fill(rnd.nextInt(3) + 1)(randomValue(col)))
      case 6 => IsNull(col)
      case 7 => IsNotNull(col)
      case 8 => EqualNullSafe(col,
        if (rnd.nextInt(4) == 0) null else randomValue(col))
      case 9 => StringStartsWith("s", randomValue("s").asInstanceOf[String])
    }
  }

  /** Reference evaluation of a filter on one row — Spark's semantics:
    * a comparison with NULL is unknown (row filtered out); NaN compares
    * ABOVE every double and equal to itself. */
  private def sat(f: Filter,
      row: (Option[Long], Option[Double], Option[String], Option[Boolean]))
      : Boolean = {
    def value(c: String): Option[Any] = c match {
      case "a" => row._1
      case "d" => row._2
      case "s" => row._3
      case "b" => row._4
    }
    // Spark's ordering: NaN is the largest double
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Double, y: Double) =>
        if (x.isNaN && y.isNaN) 0
        else if (x.isNaN) 1 else if (y.isNaN) -1
        // IEEE-equal first (Spark's SQLOrderingUtil.compareDoubles):
        // -0.0 == 0.0, unlike java.lang.Double.compare
        else if (x == y) 0
        else java.lang.Double.compare(x, y)
      case (x: String, y: String) =>
        UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    }
    f match {
      case And(l, r) => sat(l, row) && sat(r, row)
      case Or(l, r) => sat(l, row) || sat(r, row)
      case EqualTo(c, v) => value(c).exists(x => cmp(x, v) == 0)
      case EqualNullSafe(c, null) => value(c).isEmpty
      case EqualNullSafe(c, v) => value(c).exists(x => cmp(x, v) == 0)
      case GreaterThan(c, v) => value(c).exists(x => cmp(x, v) > 0)
      case GreaterThanOrEqual(c, v) => value(c).exists(x => cmp(x, v) >= 0)
      case LessThan(c, v) => value(c).exists(x => cmp(x, v) < 0)
      case LessThanOrEqual(c, v) => value(c).exists(x => cmp(x, v) <= 0)
      case In(c, vs) => value(c).exists(x => vs.exists(v =>
        v != null && cmp(x, v) == 0))
      case IsNull(c) => value(c).isEmpty
      case IsNotNull(c) => value(c).isDefined
      case StringStartsWith(c, v) =>
        value(c).exists(_.asInstanceOf[String].startsWith(v))
      case _ => fail(s"reference evaluator missing shape $f")
    }
  }

  test("canSkip and allMatch are sound on 400 random (file, filter) cases") {
    var skips = 0
    var matches = 0
    (1 to 400).foreach { caseId =>
      val n = rnd.nextInt(7) // includes empty files
      val rows = Seq.fill(n)(randomRow())
      val collector = new DirSinkStats.Collector(schema)
      rows.foreach(r => collector.observe(internal(r)))
      val field = collector.encode()
      assert(field.startsWith("s="))
      val stats = DirSinkStats.parse(field.drop(2), schema.length)
      val f = randomFilter(depth = 2)
      val matching = rows.count(r => sat(f, r))
      if (DirSinkStats.canSkip(f, schema, stats)) {
        skips += 1
        assert(matching == 0,
          s"case $caseId: canSkip claimed empty but $matching/${rows.size} " +
            s"rows match $f over $rows (stats $field)")
      }
      if (DirSinkStats.allMatch(f, schema, stats)) {
        matches += 1
        assert(matching == rows.size,
          s"case $caseId: allMatch claimed total but only " +
            s"$matching/${rows.size} rows match $f over $rows (stats $field)")
      }
    }
    // the laws must not hold vacuously: the random space must actually
    // exercise both proofs
    assert(skips > 20, s"only $skips skip-proofs fired — space too weak")
    assert(matches > 5, s"only $matches match-proofs fired — space too weak")
  }

  test("signed zero: an all--0.0 file is never pruned under d = 0.0 / d >= 0.0") {
    // the directed regression for the -0.0/0.0 ordering split: Spark's
    // filter evaluation treats them IEEE-equal, so a file whose only
    // values are -0.0 MUST survive equality/GE predicates on 0.0 (and
    // allMatch must be allowed to prove `d = 0.0` over it)
    val rows = Seq((Some(1L), Some(-0.0), Some("x"), Some(true)),
      (Some(2L), Some(-0.0), Some("y"), Some(false)))
    val collector = new DirSinkStats.Collector(schema)
    rows.foreach(r => collector.observe(internal(r)))
    val stats = DirSinkStats.parse(collector.encode().drop(2), schema.length)
    assert(!DirSinkStats.canSkip(EqualTo("d", 0.0), schema, stats))
    assert(!DirSinkStats.canSkip(GreaterThanOrEqual("d", 0.0), schema, stats))
    assert(!DirSinkStats.canSkip(LessThanOrEqual("d", 0.0), schema, stats))
    assert(DirSinkStats.allMatch(EqualTo("d", 0.0), schema, stats))
    // and symmetrically: all-0.0 file under a -0.0 predicate value
    assert(!DirSinkStats.canSkip(EqualTo("d", -0.0), schema, stats))
    assert(DirSinkStats.allMatch(GreaterThanOrEqual("d", -0.0), schema, stats))
  }

  test("prefix predicates: skip misses the prefix interval, allMatch needs both bounds inside") {
    // a URL-clustered file: every value under one host prefix
    val rows = Seq(
      (Some(1L), Some(1.0), Some("host-a/p1"), Some(true)),
      (Some(2L), Some(2.0), Some("host-a/p2"), Some(false)))
    val c = new DirSinkStats.Collector(schema)
    rows.foreach(r => c.observe(internal(r)))
    val st = DirSinkStats.parse(c.encode().drop(2), schema.length)
    // prefix above the range / below the range: provably empty
    assert(DirSinkStats.canSkip(StringStartsWith("s", "host-b/"), schema, st))
    assert(DirSinkStats.canSkip(StringStartsWith("s", "aaa"), schema, st))
    // overlapping prefix: must read
    assert(!DirSinkStats.canSkip(StringStartsWith("s", "host-a/"), schema, st))
    // both bounds inside the prefix region and no nulls: ALL match —
    // the metadata fast path for `DELETE ... WHERE url LIKE 'host-a/%'`
    assert(DirSinkStats.allMatch(StringStartsWith("s", "host-a/"), schema, st))
    assert(!DirSinkStats.allMatch(StringStartsWith("s", "host-a/p1"), schema, st))
    // a NULL row defeats all-match but not skipping semantics
    val c2 = new DirSinkStats.Collector(schema)
    (rows :+ ((Some(3L), Some(3.0), None, Some(true)))
      : Seq[(Option[Long], Option[Double], Option[String], Option[Boolean])])
      .foreach(r => c2.observe(internal(r)))
    val st2 = DirSinkStats.parse(c2.encode().drop(2), schema.length)
    assert(!DirSinkStats.allMatch(StringStartsWith("s", "host-a/"), schema, st2))
    assert(DirSinkStats.canSkip(StringStartsWith("s", "host-b/"), schema, st2))
  }

  test("exclusion: a file both skippable and all-matching must be empty") {
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(5)
      val rows = Seq.fill(n)(randomRow())
      val collector = new DirSinkStats.Collector(schema)
      rows.foreach(r => collector.observe(internal(r)))
      val stats = DirSinkStats.parse(collector.encode().drop(2), schema.length)
      val f = randomFilter(depth = 1)
      if (DirSinkStats.canSkip(f, schema, stats) &&
        DirSinkStats.allMatch(f, schema, stats))
        assert(rows.isEmpty)
    }
  }
}

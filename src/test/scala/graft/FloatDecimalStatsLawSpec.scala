package graft

import graft.sources.v2.DirSinkStats
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The FLOAT/DECIMAL extension of the skipping-stats soundness law
  * (round 13: the parquet data plane made these first-class column
  * types, so they join the stats surface — float with the same
  * IEEE NaN/-0.0 discipline as double, decimal with exact
  * BigDecimal ordering). Same laws, same adversarial posture as
  * DirSinkStatsLawSpec:
  *
  *   canSkip(f)  ⇒ no row satisfies f
  *   allMatch(f) ⇒ every row satisfies f
  *
  * over 300 seeded-random (file, filter) cases with NULLs, NaNs,
  * signed zeros, empty files, and And/Or composition. */
class FloatDecimalStatsLawSpec extends AnyFunSuite {

  private val schema = StructType.fromDDL("f FLOAT, m DECIMAL(10,2)")
  private val rnd = new scala.util.Random(20260913L)

  private def randomRow(): (Option[Float], Option[java.math.BigDecimal]) = {
    def opt[T](v: => T): Option[T] = if (rnd.nextInt(5) == 0) None else Some(v)
    (opt(rnd.nextInt(12) match {
      case 0 => Float.NaN
      case 1 => -0.0f
      case 2 => 0.0f
      case _ => (rnd.nextInt(40) - 20) / 4.0f
    }),
      opt(java.math.BigDecimal.valueOf(rnd.nextInt(2000) - 1000L, 2)))
  }

  private def internal(
      r: (Option[Float], Option[java.math.BigDecimal])): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      r._1.map(Float.box).orNull,
      r._2.map(d => Decimal(BigDecimal(d), 10, 2)).orNull))

  private def randomValue(col: String): Any = col match {
    case "f" => rnd.nextInt(14) match {
      case 0 => Float.NaN
      case 1 => -0.0f
      case 2 => 0.0f
      case _ => (rnd.nextInt(48) - 24) / 4.0f
    }
    case "m" => java.math.BigDecimal.valueOf(rnd.nextInt(2400) - 1200L, 2)
  }

  private def randomFilter(depth: Int): Filter = {
    val col = Seq("f", "m")(rnd.nextInt(2))
    if (depth > 0 && rnd.nextInt(3) == 0) {
      if (rnd.nextBoolean()) And(randomFilter(depth - 1), randomFilter(depth - 1))
      else Or(randomFilter(depth - 1), randomFilter(depth - 1))
    } else rnd.nextInt(9) match {
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
    }
  }

  /** Reference evaluation — Spark's semantics: NULL comparisons are
    * unknown; NaN sorts above every float and equals itself; -0.0f is
    * IEEE-equal to 0.0f; decimals compare exactly. */
  private def sat(f: Filter,
      row: (Option[Float], Option[java.math.BigDecimal])): Boolean = {
    def value(c: String): Option[Any] =
      if (c == "f") row._1 else row._2
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Float, y: Float) =>
        if (x.isNaN && y.isNaN) 0
        else if (x.isNaN) 1 else if (y.isNaN) -1
        else if (x == y) 0
        else java.lang.Float.compare(x, y)
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
        x.compareTo(y)
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
      case other => fail(s"reference evaluator missing shape $other")
    }
  }

  test("canSkip and allMatch stay sound over float/decimal on 300 random cases") {
    var skips = 0
    var matches = 0
    (1 to 300).foreach { caseId =>
      val rows = Seq.fill(rnd.nextInt(7))(randomRow())
      val collector = new DirSinkStats.Collector(schema)
      rows.foreach(r => collector.observe(internal(r)))
      val stats = DirSinkStats.parse(collector.encode().drop(2), schema.length)
      val f = randomFilter(depth = 2)
      val matching = rows.count(r => sat(f, r))
      if (DirSinkStats.canSkip(f, schema, stats)) {
        skips += 1
        assert(matching == 0,
          s"case $caseId: canSkip claimed empty but $matching/${rows.size} " +
            s"rows match $f over $rows")
      }
      if (DirSinkStats.allMatch(f, schema, stats)) {
        matches += 1
        assert(matching == rows.size,
          s"case $caseId: allMatch claimed total but only " +
            s"$matching/${rows.size} match $f over $rows")
      }
    }
    assert(skips > 15, s"only $skips skip-proofs fired — space too weak")
    assert(matches > 3, s"only $matches match-proofs fired — space too weak")
  }

  test("float NaN disables the column; signed zero never mis-prunes") {
    val c1 = new DirSinkStats.Collector(schema)
    c1.observe(internal((Some(1.0f), None)))
    c1.observe(internal((Some(Float.NaN), None)))
    val st1 = DirSinkStats.parse(c1.encode().drop(2), schema.length)
    assert(st1(0).disabled, "a NaN float must opt the column out")
    assert(!DirSinkStats.canSkip(EqualTo("f", 99.0f), schema, st1))

    val c2 = new DirSinkStats.Collector(schema)
    c2.observe(internal((Some(-0.0f), Some(java.math.BigDecimal.ZERO))))
    val st2 = DirSinkStats.parse(c2.encode().drop(2), schema.length)
    assert(!DirSinkStats.canSkip(EqualTo("f", 0.0f), schema, st2))
    assert(DirSinkStats.allMatch(EqualTo("f", 0.0f), schema, st2))
  }

  test("decimal bounds are exact across scale representations") {
    // 1.50 vs 1.5: plain-string canonical + BigDecimal compareTo must
    // agree they are the same value
    val c = new DirSinkStats.Collector(schema)
    c.observe(internal((None, Some(new java.math.BigDecimal("1.50")))))
    val st = DirSinkStats.parse(c.encode().drop(2), schema.length)
    assert(!DirSinkStats.canSkip(
      EqualTo("m", new java.math.BigDecimal("1.5")), schema, st))
    assert(DirSinkStats.allMatch(
      EqualTo("m", new java.math.BigDecimal("1.5")), schema, st))
    assert(DirSinkStats.canSkip(
      EqualTo("m", new java.math.BigDecimal("1.51")), schema, st))
  }
}

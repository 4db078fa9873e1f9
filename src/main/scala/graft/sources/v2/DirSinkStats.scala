package graft.sources.v2

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics for the [[DirSinkSource]] table format —
  * the DATA-SKIPPING half of the connector's read contract (the
  * Delta/Iceberg `stats`/`lower_bounds`+`upper_bounds` idea): every
  * committed file's manifest line carries min/max + null presence per
  * column, and the scan prunes whole files whose stats PROVE no row can
  * match the pushed filters — before a single byte of data is opened.
  * At 100 TB this is the difference between "open every file and let
  * the residual filter drop the rows" and "plan only the files whose
  * range overlaps the predicate": on a layout clustered by the filter
  * column (range-partitioned writes, compaction output, streaming
  * time-ordered appends) the scan cost becomes proportional to the
  * SELECTED range, not the table.
  *
  * Encoding (one field per manifest line, `s=` prefix; columns joined
  * by `;` in schema order):
  *   - `e`                      — file has zero rows (skip under any filter)
  *   - `n`                      — all values null (IsNotNull and every
  *                                comparison prune; IsNull does not)
  *   - `*`                      — stats disabled for this column (a NaN
  *                                was seen in a double column — NaN
  *                                breaks ordered bounds, so the column
  *                                opts out of skipping in this file)
  *   - `_<b64min>,<b64max>`     — no nulls, inclusive bounds
  *   - `n<b64min>,<b64max>`     — some nulls, inclusive bounds
  * Bounds are base64 of the value's canonical string form (base64's
  * alphabet contains none of the manifest separators). Old manifests
  * without the field simply never skip — forward-compatible reads.
  *
  * PRUNING IS CONSERVATIVE BY CONSTRUCTION: `canSkip` returns true only
  * when the stats prove emptiness under the filter's SQL semantics
  * (comparisons and IN never match NULL rows; `And` skips if either
  * side skips, `Or` only if both do); any unrecognized filter shape,
  * type mismatch, or parse failure returns false and the file is read.
  * String bounds compare with [[UTF8String]] binary order — the SAME
  * comparator Spark's filter evaluation uses — so writer-side stats and
  * scan-side pruning can never disagree on ordering.
  */
object DirSinkStats {

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** One column's stats: bounds in canonical string form (None = no
    * non-null value in the file), `disabled` = the `*` opt-out,
    * `nullCount` = the file's KNOWN null count for the column (round
    * 15: `Some(0)` for no-null files, the encoded count for
    * partial-null files written since counts landed, `None` for
    * legacy partial-null lines and disabled columns — the all-null
    * case derives as the file's row count at the fold, which parse
    * cannot see). Skipping never reads it; the metadata-only
    * `count(col)` fold does. */
  case class ColStats(hasNull: Boolean, min: Option[String],
                      max: Option[String], disabled: Boolean = false,
                      nullCount: Option[Long] = None)

  /** Mutable writer-side accumulator: one pass over the task's rows. */
  final class Collector(schema: StructType) {
    private val n = schema.length
    private val hasNull = new Array[Boolean](n)
    private val nullCnt = new Array[Long](n)
    private val mins = new Array[Any](n)
    private val maxs = new Array[Any](n)
    private val disabled = new Array[Boolean](n)
    private var rows = 0L

    def observe(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      rows += 1
      var i = 0
      while (i < n) {
        if (row.isNullAt(i)) { hasNull(i) = true; nullCnt(i) += 1 }
        else if (!disabled(i)) {
          val dt = schema(i).dataType
          val v: Any = dt match {
            case LongType | TimestampType => row.getLong(i)
            case IntegerType | DateType => row.getInt(i)
            case DoubleType =>
              val d = row.getDouble(i)
              // NaN has no place in an ordered bound: opt the column out
              if (java.lang.Double.isNaN(d)) { disabled(i) = true; null }
              // normalize -0.0 to 0.0 (Spark's NormalizeFloatingNumbers
              // discipline): filter evaluation compares IEEE-equal-first
              // (SQLOrderingUtil: -0.0 == 0.0), so a bound of "-0.0"
              // must never sort strictly below a predicate value of 0.0
              // — that ordering disagreement would wrongly prune a file
              // whose only values are -0.0 under `d = 0.0` / `d >= 0.0`
              else if (d == 0.0d) 0.0d
              else d
            case FloatType =>
              // same IEEE discipline as double (parquet-plane type)
              val fl = row.getFloat(i)
              if (java.lang.Float.isNaN(fl)) { disabled(i) = true; null }
              else if (fl == 0.0f) 0.0f
              else fl
            case d: DecimalType =>
              row.getDecimal(i, d.precision, d.scale)
            case BooleanType => row.getBoolean(i)
            case StringType => row.getUTF8String(i).clone()
            case _ => disabled(i) = true; null
          }
          if (!disabled(i)) {
            if (mins(i) == null || lt(dt, v, mins(i))) mins(i) = v
            if (maxs(i) == null || lt(dt, maxs(i), v)) maxs(i) = v
          }
        }
        i += 1
      }
    }

    /** The manifest field (with its `s=` prefix). */
    def encode(): String =
      "s=" + schema.indices.map { i =>
        if (disabled(i)) "*"
        else if (rows == 0) "e"
        else if (mins(i) == null) "n" // values existed but all were null
        else if (hasNull(i))
          // partial-null bounds carry the NULL COUNT as a third token
          // (digits — separator-safe), so `count(col)` can answer from
          // metadata as rows − nulls; legacy two-token lines read as
          // count-unknown and refuse, never guess
          "n" + b64(canonical(mins(i))) + "," + b64(canonical(maxs(i))) +
            "," + nullCnt(i)
        else "_" + b64(canonical(mins(i))) + "," + b64(canonical(maxs(i)))
      }.mkString(";")
  }

  private def canonical(v: Any): String = v match {
    case u: UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal =>
      d.toJavaBigDecimal.toPlainString
    case o => o.toString
  }

  /** Order two CANONICAL-STRING bounds by column type — the exact
    * writer-side collector order, reused by the metadata-only
    * aggregate fold so min/max answers can never disagree with the
    * bounds the skipper trusts. */
  private[v2] def boundLt(dt: DataType, a: String, b: String): Boolean =
    dt match {
      case LongType | TimestampType => a.toLong < b.toLong
      case IntegerType | DateType => a.toInt < b.toInt
      case DoubleType => a.toDouble < b.toDouble
      case FloatType => a.toFloat < b.toFloat
      case _: DecimalType =>
        new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) < 0
      case BooleanType => !a.toBoolean && b.toBoolean
      case StringType =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
      case _ => false
    }

  private def lt(dt: DataType, a: Any, b: Any): Boolean = dt match {
    case LongType | TimestampType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case IntegerType | DateType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case DoubleType => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case FloatType => a.asInstanceOf[Float] < b.asInstanceOf[Float]
    case _: DecimalType =>
      a.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .compare(b.asInstanceOf[org.apache.spark.sql.types.Decimal]) < 0
    case BooleanType => !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
    case StringType =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]) < 0
    case _ => false
  }

  /** Parse a manifest stats field (without the `s=` prefix) back into
    * per-column stats; any malformed column yields a never-skip entry. */
  def parse(field: String, nCols: Int): Array[ColStats] = {
    val parts = field.split(";", -1)
    Array.tabulate(nCols) { i =>
      if (i >= parts.length) ColStats(hasNull = true, None, None, disabled = true)
      else parts(i) match {
        case "*" => ColStats(hasNull = true, None, None, disabled = true)
        case "e" => ColStats(hasNull = false, None, None, nullCount = Some(0L))
        case "n" => ColStats(hasNull = true, None, None)
        case s if s.length > 1 && (s.head == '_' || s.head == 'n') &&
          s.indexOf(',') > 0 =>
          try {
            val body = s.tail.split(",", -1)
            val nulls =
              if (s.head != 'n') Some(0L) // no-null bounds
              else if (body.length >= 3) Some(body(2).toLong)
              else None // legacy partial-null line: count unknown
            ColStats(s.head == 'n',
              Some(unb64(body(0))), Some(unb64(body(1))),
              nullCount = nulls)
          } catch { case _: RuntimeException =>
            ColStats(hasNull = true, None, None, disabled = true)
          }
        case _ => ColStats(hasNull = true, None, None, disabled = true)
      }
    }
  }

  /** Is this filter shape one the skipper understands? (Gates what the
    * scan reports as pushed; everything is residual either way.) */
  def supported(f: Filter, schema: StructType): Boolean = f match {
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
    case EqualTo(c, _) => comparable(c, schema)
    case EqualNullSafe(c, _) => comparable(c, schema)
    case GreaterThan(c, _) => comparable(c, schema)
    case GreaterThanOrEqual(c, _) => comparable(c, schema)
    case LessThan(c, _) => comparable(c, schema)
    case LessThanOrEqual(c, _) => comparable(c, schema)
    case In(c, _) => comparable(c, schema)
    case StringStartsWith(c, _) =>
      schema.fields.find(_.name == c).exists(_.dataType == StringType)
    case IsNull(c) => schema.fieldNames.contains(c)
    case IsNotNull(c) => schema.fieldNames.contains(c)
    case _ => false
  }

  private def comparable(c: String, schema: StructType): Boolean =
    schema.fields.find(_.name == c).exists(_.dataType match {
      case LongType | IntegerType | DoubleType | FloatType | BooleanType |
           StringType | TimestampType | DateType => true
      case _: DecimalType => true
      case _ => false
    })

  /** Three-way compare of a canonical-string bound against a filter
    * value; None = incomparable (never prove anything on it). Shared by
    * [[canSkip]] and [[allMatch]] so skip-proofs and match-proofs can
    * never disagree on ordering. Doubles compare IEEE-EQUAL-FIRST
    * (`b == d` before `Double.compare`) — the same discipline as
    * Spark's `SQLOrderingUtil.compareDoubles`, so `-0.0` and `0.0` are
    * EQUAL here exactly as they are in Spark's filter evaluation
    * (plain `Double.compare` would order -0.0 < 0.0 and wrongly prune
    * an all-`-0.0` file under `d = 0.0` / `d >= 0.0`). */
  private def cmp(fld: StructField, bound: String, v: Any): Option[Int] =
    try fld.dataType match {
      case LongType => v match {
        case n: Long => Some(java.lang.Long.compare(bound.toLong, n))
        case n: Int => Some(java.lang.Long.compare(bound.toLong, n.toLong))
        case _ => None
      }
      case IntegerType => v match {
        case n: Int => Some(java.lang.Integer.compare(bound.toInt, n))
        case n: Long => Some(java.lang.Long.compare(bound.toInt.toLong, n))
        case _ => None
      }
      case DoubleType => v match {
        case d: Double =>
          if (java.lang.Double.isNaN(d)) None
          else {
            val b = bound.toDouble
            if (b == d) Some(0) // IEEE: -0.0 == 0.0
            else Some(java.lang.Double.compare(b, d))
          }
        case _ => None
      }
      case FloatType => v match {
        // a float widens to double EXACTLY, so the IEEE-equal-first
        // double compare is sound for both Float and Double values
        case f: Float =>
          if (java.lang.Float.isNaN(f)) None
          else {
            val b = bound.toDouble
            if (b == f.toDouble) Some(0)
            else Some(java.lang.Double.compare(b, f.toDouble))
          }
        case d: Double =>
          if (java.lang.Double.isNaN(d)) None
          else {
            val b = bound.toDouble
            if (b == d) Some(0) else Some(java.lang.Double.compare(b, d))
          }
        case _ => None
      }
      case _: DecimalType => v match {
        case d: java.math.BigDecimal =>
          Some(new java.math.BigDecimal(bound).compareTo(d))
        case d: BigDecimal =>
          Some(new java.math.BigDecimal(bound).compareTo(d.bigDecimal))
        case _ => None
      }
      case BooleanType => v match {
        case b: Boolean => Some(java.lang.Boolean.compare(bound.toBoolean, b))
        case _ => None
      }
      case StringType => v match {
        case s: String =>
          Some(UTF8String.fromString(bound).compareTo(UTF8String.fromString(s)))
        case u: UTF8String => Some(UTF8String.fromString(bound).compareTo(u))
        case _ => None
      }
      // pushed temporal filter values arrive as EXTERNAL types
      // (java.sql / java.time); bounds are the internal integer
      // encodings — convert the value, compare as integers
      case TimestampType => v match {
        case t: java.sql.Timestamp =>
          // getTime already carries the millis of the nanos field; add
          // only the sub-millisecond remainder
          val micros = t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
          Some(java.lang.Long.compare(bound.toLong, micros))
        case t: java.time.Instant =>
          val micros = math.addExact(
            math.multiplyExact(t.getEpochSecond, 1000000L),
            (t.getNano / 1000).toLong)
          Some(java.lang.Long.compare(bound.toLong, micros))
        case _ => None
      }
      case DateType => v match {
        case d: java.sql.Date =>
          Some(java.lang.Long.compare(bound.toInt.toLong,
            d.toLocalDate.toEpochDay))
        case d: java.time.LocalDate =>
          Some(java.lang.Long.compare(bound.toInt.toLong, d.toEpochDay))
        case _ => None
      }
      case _ => None
    } catch {
      case _: NumberFormatException => None
      case _: ArithmeticException => None // overflowed temporal conversion
    }

  /** Unsigned lexicographic compare of `s`'s UTF-8 bytes TRUNCATED to
    * the prefix's length against the prefix bytes — the binary order
    * [[UTF8String]] uses, so "does any v-prefixed string fit between
    * these bounds" is answered without ever synthesizing a successor
    * string (whose byte increment could be invalid UTF-8). A value
    * shorter than the prefix compares over its own length, then shorter
    * sorts first (standard lexicographic). */
  private def cmpPrefixBytes(s: String, prefix: String): Int = {
    val a = s.getBytes("UTF-8")
    val b = prefix.getBytes("UTF-8")
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    if (a.length >= b.length) 0 else -1 // s's prefix-window vs prefix
  }

  /** True only when the stats PROVE no row of the file can satisfy the
    * filter. Unknown shapes / missing stats → false (read the file). */
  def canSkip(f: Filter, schema: StructType, stats: Array[ColStats]): Boolean = {
    // a column the (possibly era-) schema does not carry resolves to
    // None -> conservative no-skip, never a fieldIndex throw: time
    // travel can evaluate a head-schema filter against an older schema
    def col(c: String): Option[(StructField, ColStats)] =
      schema.fieldNames.indexOf(c) match {
        case -1 => None
        case i if i < stats.length && !stats(i).disabled =>
          Some((schema(i), stats(i)))
        case _ => None
      }
    // comparisons and IN never match a NULL row: a file with no
    // non-null value for the column cannot satisfy them
    def noValues(st: ColStats): Boolean = st.min.isEmpty

    def outOfRange(c: String, v: Any): Boolean = col(c).exists {
      case (fld, st) =>
        noValues(st) || v == null || {
          val below = cmp(fld, st.max.get, v).exists(_ < 0) // max < v
          val above = cmp(fld, st.min.get, v).exists(_ > 0) // min > v
          below || above
        }
    }

    f match {
      case And(l, r) =>
        canSkip(l, schema, stats) || canSkip(r, schema, stats)
      case Or(l, r) =>
        canSkip(l, schema, stats) && canSkip(r, schema, stats)
      case EqualTo(c, v) => outOfRange(c, v)
      case EqualNullSafe(c, null) => // <=> NULL: matches only null rows
        col(c).exists { case (_, st) => !st.hasNull }
      case EqualNullSafe(c, v) => outOfRange(c, v)
      case GreaterThan(c, v) => col(c).exists { case (fld, st) =>
        noValues(st) || cmp(fld, st.max.get, v).exists(_ <= 0) } // max <= v
      case GreaterThanOrEqual(c, v) => col(c).exists { case (fld, st) =>
        noValues(st) || cmp(fld, st.max.get, v).exists(_ < 0) } // max < v
      case LessThan(c, v) => col(c).exists { case (fld, st) =>
        noValues(st) || cmp(fld, st.min.get, v).exists(_ >= 0) } // min >= v
      case LessThanOrEqual(c, v) => col(c).exists { case (fld, st) =>
        noValues(st) || cmp(fld, st.min.get, v).exists(_ > 0) } // min > v
      case In(c, vs) =>
        col(c).isDefined && (vs.isEmpty || vs.forall(v => outOfRange(c, v)))
      // prefix predicates (URL-clustered corpora: `url LIKE 'x%'`):
      // v-prefixed strings occupy the byte interval [v, v-successor);
      // the file skips iff its bounds miss that interval — max < v
      // (full compare: any v-prefixed s satisfies s >= v), or min's
      // prefix-window already sorts ABOVE v (every row >= min > all
      // v-prefixed strings)
      case StringStartsWith(c, v) if v != null =>
        col(c).exists { case (fld, st) =>
          fld.dataType == StringType && (st.min.isEmpty ||
            cmp(fld, st.max.get, v).exists(_ < 0) ||
            cmpPrefixBytes(st.min.get, v) > 0)
        }
      case IsNull(c) => col(c).exists { case (_, st) => !st.hasNull }
      case IsNotNull(c) => col(c).exists { case (_, st) =>
        st.min.isEmpty } // no non-null value: all-null file or zero rows
      case _ => false
    }
  }

  /** The dual of [[canSkip]]: true only when the stats PROVE that EVERY
    * row of the file satisfies the filter — the file-aligned DELETE
    * test (a provably-all-match file can be dropped from the manifest
    * without reading it; Delta's metadata-delete shape). Conservative
    * false on anything unprovable. NULL semantics matter here more than
    * in skipping: a NULL row does NOT satisfy a comparison, so any
    * null presence defeats all-match for comparison shapes. */
  def allMatch(f: Filter, schema: StructType, stats: Array[ColStats]): Boolean = {
    // missing column -> None -> all-match unprovable (same discipline
    // as canSkip's safe lookup)
    def col(c: String): Option[(StructField, ColStats)] =
      schema.fieldNames.indexOf(c) match {
        case -1 => None
        case i if i < stats.length && !stats(i).disabled =>
          Some((schema(i), stats(i)))
        case _ => None
      }

    // every row non-null for c, and bounds prove the comparison for all
    def allRows(c: String, v: Any)(
        proof: (StructField, ColStats) => Boolean): Boolean =
      v != null && col(c).exists { case (fld, st) =>
        !st.hasNull && st.min.isDefined && proof(fld, st)
      }

    f match {
      case And(l, r) =>
        allMatch(l, schema, stats) && allMatch(r, schema, stats)
      case Or(l, r) =>
        allMatch(l, schema, stats) || allMatch(r, schema, stats)
      case EqualTo(c, v) => allRows(c, v) { (fld, st) =>
        cmp(fld, st.min.get, v).contains(0) && cmp(fld, st.max.get, v).contains(0) }
      case GreaterThan(c, v) => allRows(c, v) { (fld, st) =>
        cmp(fld, st.min.get, v).exists(_ > 0) } // min > v
      case GreaterThanOrEqual(c, v) => allRows(c, v) { (fld, st) =>
        cmp(fld, st.min.get, v).exists(_ >= 0) }
      case LessThan(c, v) => allRows(c, v) { (fld, st) =>
        cmp(fld, st.max.get, v).exists(_ < 0) } // max < v
      case LessThanOrEqual(c, v) => allRows(c, v) { (fld, st) =>
        cmp(fld, st.max.get, v).exists(_ <= 0) }
      // every row starts with v iff BOTH bounds do (binary order makes
      // the v-prefixed region an interval, so bounds inside ⇒ all
      // inside) and no row is NULL — this is what turns
      // `DELETE … WHERE url LIKE 'host/%'` on a URL-clustered zone into
      // a pure metadata operation
      case StringStartsWith(c, v) if v != null => col(c).exists {
        case (fld, st) =>
          fld.dataType == StringType && !st.hasNull && st.min.isDefined &&
            cmpPrefixBytes(st.min.get, v) == 0 &&
            st.min.get.getBytes("UTF-8").length >=
              v.getBytes("UTF-8").length &&
            cmpPrefixBytes(st.max.get, v) == 0 &&
            st.max.get.getBytes("UTF-8").length >=
              v.getBytes("UTF-8").length
      }
      case IsNull(c) => col(c).exists { case (_, st) =>
        st.min.isEmpty && (st.hasNull || isEmpty(st)) }
      case IsNotNull(c) => col(c).exists { case (_, st) => !st.hasNull }
      case AlwaysTrue() => true
      case _ => false
    }
  }

  /** Zero-row marker ("e"): no values AND no nulls. */
  private def isEmpty(st: ColStats): Boolean = !st.hasNull && st.min.isEmpty

  /** Translate a pushed filter back into a Column with IDENTICAL
    * semantics — the copy-on-write DELETE's row predicate (files the
    * stats cannot decide are rewritten keeping `!toColumn(f)`). None
    * for shapes we don't translate; `canDeleteWhere` refuses those. */
  def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
      case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
      case Not(c) => toColumn(c).map(!_)
      case EqualTo(c, v) => Some(col(c) === lit(v))
      case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
      case GreaterThan(c, v) => Some(col(c) > lit(v))
      case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
      case LessThan(c, v) => Some(col(c) < lit(v))
      case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
      case In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
      case IsNull(c) => Some(col(c).isNull)
      case IsNotNull(c) => Some(col(c).isNotNull)
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case StringStartsWith(c, v) => Some(col(c).startsWith(v))
      case StringEndsWith(c, v) => Some(col(c).endsWith(v))
      case StringContains(c, v) => Some(col(c).contains(v))
      case _ => None
    }
  }

  /** BUCKET PRUNING — the buckets a conjunction of pushed filters can
    * possibly touch on a bucketed zone ([[DirSink.BucketSpec]]): an
    * equality/IN on the bucket column pins its key set, and each key
    * hashes to exactly one bucket, so only those buckets' files can
    * hold matching rows. Conjuncts INTERSECT; a disjunction contributes
    * only if BOTH arms constrain the column (union of arms). None =
    * unconstrained (read every bucket) — never wrong, just unpruned.
    * IsNull pins bucket 0 (where [[DirSink.bucketId]] sends NULL keys). */
  def bucketCandidates(filters: Seq[Filter],
                       spec: DirSink.BucketSpec): Option[Set[Int]] = {
    def ofOne(f: Filter): Option[Set[Int]] = f match {
      case EqualTo(c, v) if c == spec.col && v != null =>
        Some(Set(DirSink.bucketId(v, spec.n)))
      case EqualNullSafe(c, v) if c == spec.col =>
        Some(Set(DirSink.bucketId(v, spec.n)))
      case In(c, vs) if c == spec.col =>
        Some(vs.toSet[Any].map(v => DirSink.bucketId(v, spec.n)))
      case IsNull(c) if c == spec.col => Some(Set(DirSink.bucketId(null, spec.n)))
      case And(l, r) => (ofOne(l), ofOne(r)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
      case Or(l, r) => for (a <- ofOne(l); b <- ofOne(r)) yield a union b
      case _ => None
    }
    filters.flatMap(ofOne(_)).reduceOption(_ intersect _)
  }
}

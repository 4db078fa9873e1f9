package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Declared-schema ↔ physical-file parity for every testdata table.
  *
  * Round-6 post-mortem: the driver regenerated the testdata between
  * rounds and `events.ts` changed physical type (timestamp[ns] →
  * timestamp[us]); the loader's nanos special-casing silently produced
  * epoch-collapsed timestamps and 17 downstream hash failures. This spec
  * makes the NEXT data-shape change fail loudly at the source: the
  * inferred (footer) schema of each parquet must match `Tables.schemas`
  * field-for-field — same names, same order, and the same type up to the
  * timestamp NTZ/LTZ distinction (the session pins UTC, where the two
  * read identically; any OTHER divergence, including a unit change
  * surfacing as LongType again, is a real break). */
class SchemaParitySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  private def compatible(declared: DataType, physical: DataType): Boolean =
    (declared, physical) match {
      case (TimestampType, TimestampNTZType) => true
      case (TimestampType, TimestampType) => true
      case (ArrayType(d, _), ArrayType(p, _)) => compatible(d, p)
      case (d, p) => d == p
    }

  test("every declared table schema matches its parquet footer") {
    val problems = graft.sources.Tables.schemas.toSeq.sortBy(_._1).flatMap {
      case (name, declared) =>
        val physical = spark.read.parquet(s"$dir/$name.parquet").schema
        val nameDiff =
          if (physical.fieldNames.toSeq != declared.fieldNames.toSeq)
            Seq(s"$name: fields ${physical.fieldNames.mkString(",")} vs " +
              s"declared ${declared.fieldNames.mkString(",")}")
          else Seq.empty
        val typeDiff = declared.fields.zip(physical.fields).collect {
          case (d, p) if d.name == p.name && !compatible(d.dataType, p.dataType) =>
            s"$name.${d.name}: declared ${d.dataType.simpleString} vs " +
              s"physical ${p.dataType.simpleString}"
        }
        nameDiff ++ typeDiff
    }
    assert(problems.isEmpty,
      "testdata physical schema drifted from Tables.schemas — likely a " +
        "driver-side regeneration; fix the loader BEFORE debugging query " +
        s"code:\n  ${problems.mkString("\n  ")}")
  }
}

package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver's cross-engine comparator (round-1 `CORRECTNESS_r01.json`)
  * loads both result sets into pandas and lexsorts every column before
  * hashing — a top-level array/map/struct column raises
  * `unhashable type: numpy.ndarray` and voids the check for that query.
  * This guard pins the round-2 fix: every declared query's OUTPUT schema
  * is scalar-only (arrays may exist inside the plan, never at the top
  * level — serialize with array_join / split into scalar columns).
  */
class OutputSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("no declared query emits a top-level array/map/struct column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, TestSession.sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §2 header "salting for skew" /
  * north-star scale posture). AQE's skew-join split handles most cases at
  * runtime; explicit salting remains the tool when one key dominates so
  * heavily that even split shuffle blocks overload a task — the classic
  * "one hot customer is 30% of the fact table" shape at 100 TB.
  *
  * `saltedJoin(fact, dim, key, buckets)`: the fact side gets a random-ish
  * but DETERMINISTIC salt (pmod of a hash of a stable row id), the dim
  * side is exploded `buckets`× with every salt value, and the join key
  * becomes (key, salt) — the hot key's rows spread over `buckets` tasks.
  * Dim replication cost is |dim|·buckets, so this is for fact⋈dim joins
  * where the dim is small but not broadcast-small.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a stable id column. */
  def salt(id: Column, buckets: Int): Column =
    pmod(xxhash64(id), lit(buckets))

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSrc: String, buckets: Int): DataFrame = {
    val f = fact.withColumn("__salt", salt(col(saltSrc), buckets))
    val d = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}

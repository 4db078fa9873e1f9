package graft.operators

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Array and JSON columns (SURVEY.md §2.8 F4/F5): higher-order and
  * generator functions over `embeddings.embedding` (ArrayType(FloatType))
  * and the JSON `events.props` string. All codegen'd built-ins — the
  * explode is Spark's `Generate`, no custom UDTF (SURVEY.md §2.11).
  */
object SemiStructured extends QueryModule {

  /** F4 q_array_funcs — size/element_at/slice over the embedding column.
    * The slice result is re-projected to scalar floats (h2/h3) so the
    * declared output carries no array columns (cross-engine comparator
    * hashes scalars only). */
  private def qArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.load(s, dir, "embeddings")
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("dim"),
        element_at($"embedding", 1).as("e1"),
        element_at($"embedding", -1).as("e_last"),
        element_at(slice($"embedding", 1, 3), 2).as("h2"),
        element_at(slice($"embedding", 1, 3), 3).as("h3"))
      .orderBy($"vec_id")
  }

  /** F4 q_array_explode — posexplode a bounded slice (generator). */
  private def qArrayExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.load(s, dir, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", $"pos".cast("long").as("pos"), $"col".as("val"))
      .orderBy($"vec_id", $"pos")
  }

  /** F5 q_json_funcs — extract typed fields from the `props` JSON string
    * (`get_json_object` path expression; schema-on-read). */
  private def qJsonFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.load(s, dir, "events")
      .select(
        $"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"),
        (get_json_object($"props", "$.k").cast("long") % 10).as("k_mod"))
      .orderBy($"event_id")
  }

  /** F5b q_map_funcs — MapType surface: JSON parsed to map<string,bigint>,
    * then key lookup and cardinality (the map column itself stays
    * Spark-internal; only engine-comparable scalars are emitted). */
  private def qMapFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.load(s, dir, "events")
      .withColumn("m", from_json($"props", MapType(StringType, LongType)))
      .select(
        $"event_id",
        element_at($"m", "k").as("k_val"),
        size(map_keys($"m")).cast("long").as("n_keys"),
        array_contains(map_keys($"m"), "k").as("has_k"))
      .orderBy($"event_id")
  }

  /** F4b q_hof_funcs — the higher-order-function surface proper:
    * transform → filter → aggregate (fold) + zip_with, all codegen'd
    * lambda built-ins over the embedding array. Every emitted scalar is
    * integer-exact: elements are quantized to 1e-6 BIGINTs inside
    * `transform`, then folded with integer adds (order-free — unlike a
    * double fold, whose left-to-right engine agreement this repo proves
    * elsewhere but doesn't need here), so l1/sum/dot survive the hash
    * gate with zero float drift. zip_with pairs the vector with its
    * reverse — a pure-lambda self-combination with no second scan. */
  private def qHofFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = "CAST(embedding AS ARRAY<DOUBLE>)"
    def q(x: String) = s"CAST(floor(($x) * 1000000.0 + 0.5) AS BIGINT)"
    graft.sources.Tables.load(s, dir, "embeddings")
      .select(
        $"vec_id",
        expr(s"CAST(size(filter($e, x -> x > 0.0)) AS BIGINT)").as("n_pos"),
        expr(s"aggregate(transform($e, x -> ${q("x")}), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("sum_q"),
        expr(s"aggregate(transform($e, x -> ${q("abs(x)")}), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("l1_q"),
        expr(s"aggregate(zip_with($e, reverse($e), (x, y) -> ${q("x * y")}), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("revdot_q"),
        expr(s"array_max(transform($e, x -> ${q("x")}))").as("max_q"),
        expr(s"exists($e, x -> abs(x) > 2.0)").as("has_large"))
      .orderBy($"vec_id")
  }

  val queries: Map[String, Q] = Map(
    "q_array_funcs" -> (qArrayFuncs _),
    "q_array_explode" -> (qArrayExplode _),
    "q_hof_funcs" -> (qHofFuncs _),
    "q_json_funcs" -> (qJsonFuncs _),
    "q_map_funcs" -> (qMapFuncs _))

  val oracles: Map[String, String] = Map(
    "q_hof_funcs" ->
      """WITH n AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings)
         SELECT vec_id,
                CAST(len(list_filter(e, x -> x > 0.0)) AS BIGINT) AS n_pos,
                CAST(list_sum(list_transform(e,
                  x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)))
                  AS BIGINT) AS sum_q,
                CAST(list_sum(list_transform(e,
                  x -> CAST(floor(abs(x) * 1000000.0 + 0.5) AS BIGINT)))
                  AS BIGINT) AS l1_q,
                CAST(list_sum(list_transform(range(1, len(e) + 1),
                  i -> CAST(floor((e[i] * e[len(e) - i + 1]) * 1000000.0
                                  + 0.5) AS BIGINT)))
                  AS BIGINT) AS revdot_q,
                CAST(list_max(list_transform(e,
                  x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)))
                  AS BIGINT) AS max_q,
                len(list_filter(e, x -> abs(x) > 2.0)) > 0 AS has_large
         FROM n ORDER BY vec_id""",
    "q_array_funcs" ->
      """SELECT vec_id,
                CAST(len(embedding) AS BIGINT) AS dim,
                embedding[1] AS e1,
                embedding[-1] AS e_last,
                embedding[1:3][2] AS h2,
                embedding[1:3][3] AS h3
         FROM embeddings ORDER BY vec_id""",
    "q_array_explode" ->
      """SELECT vec_id,
                unnest(range(0, len(embedding))) AS pos,
                unnest(embedding) AS val
         FROM embeddings WHERE vec_id < 10
         ORDER BY vec_id, pos""",
    "q_json_funcs" ->
      """SELECT event_id,
                CAST(props->>'$.k' AS BIGINT) AS k,
                CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod
         FROM events ORDER BY event_id""",
    "q_map_funcs" ->
      """SELECT event_id,
                CAST(props->>'$.k' AS BIGINT) AS k_val,
                CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
                list_contains(json_keys(props), 'k') AS has_k
         FROM events ORDER BY event_id""")
}

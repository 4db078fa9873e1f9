package graft.tools
/** Builder aid: print declared/oracled query counts. */
object Counts {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"declared=${q.size} oracled=${o.size}")
    println(s"unoracled=${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"orphan_oracles=${(o -- q).toSeq.sorted.mkString(",")}")
  }
}

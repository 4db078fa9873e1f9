package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder diagnostic (not a declared query): wedge-volume slope of the
  * triangle/jaccard candidate generators under a PLANTED HUB — the
  * power-law hazard the round-7 degree orientation and hub cap close.
  *
  * Graph: a hub node (id 0 — the id-orientation worst case) linked to D
  * leaves, plus a ring among the leaves so degrees aren't degenerate.
  * For each D it prints candidate-pair volume three ways:
  *   - id-oriented wedges (the pre-round-7 q_triangles shape): the hub
  *     mints C(D,2) — quadratic in hub degree,
  *   - degree-oriented wedges ([[graft.operators.Graphs.orientByDegree]]):
  *     the hub's edges all point inbound, volume stays ring-sized,
  *   - jaccard center-join pairs with the [[graft.operators.Baskets]]
  *     cap at 256: clamps the hub's D² to cap².
  *
  * Usage: sbt "runMain graft.tools.GraphProbe [D ...]" (default 512 2048)
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val ds = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(512, 2048)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    ds.foreach { d =>
      val star = (1 to d).map(l => (0L, l.toLong))
      val ring = (1 to d).map(l => (l.toLong, (l % d + 1).toLong))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val und = (star ++ ring).distinct
      val u = und.toDF("a", "b")
      // id-orientation wedge volume Σ_v C(out-deg_id(v), 2): out-edges
      // under low-id->high-id are exactly u's (a, b) rows keyed by a
      val idWedges = u.groupBy($"a").agg(count(lit(1)).as("od"))
        .select(expr("sum((od * (od - 1)) div 2)")).as[Long].head()
      val degWedges = graft.operators.Graphs.wedges(
        graft.operators.Graphs.orientByDegree(u)).count()
      // jaccard candidate pairs: symmetrized adjacency joined on the
      // shared neighbor, with and without the per-center cap
      val eu = u.select($"a".as("src"), $"b".as("dst"))
        .union(u.select($"b".as("src"), $"a".as("dst")))
      def pairs(adj: org.apache.spark.sql.DataFrame): Long =
        adj.select($"dst".as("w"), $"src".as("x"))
          .join(adj.select($"dst".as("w"), $"src".as("y")), Seq("w"))
          .filter($"x" < $"y").count()
      val rawPairs = pairs(eu)
      val capPairs = pairs(graft.operators.Baskets.capPerItem(
        eu, "dst", "src", graft.operators.Graphs.JaccardHubCap))
      println(f"D=$d%6d  idWedges=$idWedges%10d  degWedges=$degWedges%8d" +
        f"  jaccardPairs=$rawPairs%10d  capped=$capPairs%10d")
    }
    spark.stop()
  }
}

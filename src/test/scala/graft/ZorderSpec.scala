package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout guarantees (q_zorder_layout): the morton arithmetic is
  * a true bit-interleave, the layout round-trips every row, and — the
  * property the layout exists for — per-FILE min/max rectangles are
  * dramatically tighter than a natural-order layout's, which is exactly
  * what parquet row-group/file skipping consumes at 100 TB. */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  test("morton expr matches a reference bit-interleave on crafted and random points") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val pts = Seq((0L, 0L), (5L, 3L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (1L, 32768L)) ++
      (1 to 50).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
    val got = pts.toDF("x", "y")
      .withColumn("z", expr(operators.Layouts.mortonExpr("x", "y", "div")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y), s"($x,$y)") }
  }

  test("z-ordered layout round-trips every order and clusters both dims per file") {
    import spark.implicits._
    val orders = graft.sources.Tables.load(spark, dir, "orders")
    val z = operators.Layouts.ordersZordered(spark, dir)
    assert(z.count() == orders.count())

    // per-file normalized span product (the rectangle a reader must admit
    // when either dim is filtered) — z-order vs the natural orderkey sort
    def spanProduct(df: org.apache.spark.sql.DataFrame): Double = {
      val files = df.withColumn("f", input_file_name())
        .groupBy($"f")
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"yd").as("y0"), max($"yd").as("y1"))
        .as[(String, Long, Long, Long, Long)].collect()
      val (gx0, gx1) = (files.map(_._2).min, files.map(_._3).max)
      val (gy0, gy1) = (files.map(_._4).min, files.map(_._5).max)
      files.map { case (_, x0, x1, y0, y1) =>
        ((x1 - x0).toDouble / math.max(gx1 - gx0, 1)) *
          ((y1 - y0).toDouble / math.max(gy1 - gy0, 1))
      }.sum / files.length
    }

    val naturalPath = s"/tmp/graft_zorder_natural_${dir.hashCode.toHexString}"
    val base = orders
      .withColumn("x", $"o_custkey" % 65536L)
      .withColumn("yd",
        datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
          .cast("long") % 65536L)
      .select($"o_orderkey", $"x", $"yd")
    base.repartitionByRange(8, $"o_orderkey")
      .sortWithinPartitions($"o_orderkey")
      .write.mode("overwrite").parquet(naturalPath)

    val zP = spanProduct(z)
    val nP = spanProduct(spark.read.parquet(naturalPath))
    assert(zP < 0.5 * nP,
      s"z-order mean file rectangle $zP must beat natural order $nP by 2x+")
  }
}

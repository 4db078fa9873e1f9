package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 TableCatalog tier (sources.v2.GraftCatalog): DirSink tables
  * addressable as SQL names — CREATE / CTAS / INSERT / SELECT / RENAME /
  * DROP all resolve through Spark's catalog plumbing into the proven
  * staged-write manifest-commit machinery. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    if (s.conf.getOption("spark.sql.catalog.graftcat").isEmpty) {
      s.conf.set("spark.sql.catalog.graftcat",
        "graft.sources.v2.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftcat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    }
    s
  }

  test("create + insert + select round-trips through SQL names") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db1")
    spark.sql("CREATE TABLE graftcat.db1.docs (id BIGINT, body STRING)")
    spark.sql(
      "INSERT INTO graftcat.db1.docs VALUES (1, 'alpha'), (2, 'beta')")
    spark.sql("INSERT INTO graftcat.db1.docs VALUES (3, 'gamma')")
    val got = spark.sql("SELECT id, body FROM graftcat.db1.docs")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // the catalog resolves into the SAME manifest protocol: the table
    // dir holds a _GRAFT_COMMIT whose schema is the DDL's
    val wh = spark.conf.get("spark.sql.catalog.graftcat.warehouse")
    val m = graft.sources.v2.DirSink.readManifest(s"$wh/db1/docs")
    assert(m.exists(_._1.fieldNames.toSeq == Seq("id", "body")),
      s"manifest schema mismatch: ${m.map(_._1.toDDL)}")
  }

  test("CTAS materializes a query as a named table") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db2")
    Seq((10L, 1.5), (20L, -2.0)).toDF("k", "x")
      .createOrReplaceTempView("ctas_src")
    spark.sql(
      """CREATE TABLE graftcat.db2.derived AS
         SELECT k, x * 2 AS x2 FROM ctas_src""")
    val got = spark.sql("SELECT k, x2 FROM graftcat.db2.derived")
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((10L, 3.0), (20L, -4.0)))
  }

  test("duplicate create fails; drop removes; a dropped table is unresolvable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db3")
    spark.sql("CREATE TABLE graftcat.db3.t (id BIGINT)")
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcat.db3.t (id BIGINT)")
    }
    spark.sql("DROP TABLE graftcat.db3.t")
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM graftcat.db3.t").collect()
    }
  }

  test("rename moves the directory; listTables sees only committed tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db4")
    spark.sql("CREATE TABLE graftcat.db4.a (id BIGINT)")
    spark.sql("INSERT INTO graftcat.db4.a VALUES (7)")
    // RENAME TO takes a catalog-less multipart name, resolved in the
    // source table's catalog
    spark.sql("ALTER TABLE graftcat.db4.a RENAME TO db4.b")
    assert(spark.sql("SELECT id FROM graftcat.db4.b").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM graftcat.db4.a").collect()
    }
    val names = spark.sql("SHOW TABLES IN graftcat.db4").collect()
      .map(_.getString(1)).toSet
    assert(names == Set("b"))
  }

  test("INSERT OVERWRITE swaps the table's contents through the truncate path") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db6")
    spark.sql("CREATE TABLE graftcat.db6.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graftcat.db6.t VALUES (1, 'old'), (2, 'old2')")
    spark.sql("INSERT OVERWRITE graftcat.db6.t VALUES (9, 'new')")
    val got = spark.sql("SELECT id, v FROM graftcat.db6.t")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((9L, "new")),
      "overwrite must replace the previous generation atomically")
  }

  test("a catalog table is tailable: readStream over the SQL name's directory") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db5")
    spark.sql("CREATE TABLE graftcat.db5.feed (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graftcat.db5.feed VALUES (1, 'x')")
    val wh = spark.conf.get("spark.sql.catalog.graftcat.warehouse")
    val q = spark.readStream.format("graft.sources.v2.DirSinkSource")
      .option("path", s"$wh/db5/feed").load()
      .writeStream.format("memory").queryName("catalog_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO graftcat.db5.feed VALUES (2, 'y')")
      q.processAllAvailable()
      assert(spark.table("catalog_tail").as[(Long, String)]
        .collect().toSeq.sorted == Seq((1L, "x"), (2L, "y")))
    } finally q.stop()
  }
}

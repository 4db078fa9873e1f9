package graft

import graft.sources.v2.{DirSink, DirSinkScan, DirSinkSource}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BUCKETED ZONES + STORAGE-PARTITIONED JOINS in the DirSink table
  * format: every committed file is pure in one bucket of
  * `DirSink.bucketId(col, n)` (manifest `k=` tags), the scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, and two zones bucketed on
  * their join key with equal counts join WITHOUT a shuffle through
  * Spark's SPJ machinery — the co-located-join economics that deletes
  * the dominant exchange of a 100 TB fact-to-fact join. Each case pins
  * both halves: the layout mechanics (purity, inheritance, pruning,
  * maintenance survival) and the plan shape (zero shuffle exchanges
  * under the join).
  */
class DirSinkBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val fmt = classOf[DirSinkSource].getName

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_bucket").toString

  private def read(dir: String): DataFrame =
    spark.read.format(fmt).option("path", dir).load()

  private def scanOf(df: DataFrame): DirSinkScan = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[DirSinkScan]
    }.get
  }

  /** Every manifest line must carry a bucket tag, and every row in each
    * committed file must hash to that file's tag. */
  private def assertPure(dir: String, col0: String): Unit = {
    val spec = DirSink.zoneBucket(dir).getOrElse(
      fail(s"zone $dir has no bucket header"))
    val (_, entries) = DirSink.readManifestEntries(dir).get
    assert(entries.nonEmpty && entries.forall(_.bucket.isDefined),
      s"every committed file must carry k=: $entries")
    val rows = read(dir).select(expr(s"_file"), expr(col0)).collect()
    val byFile = entries.map(e => e.name -> e.bucket.get).toMap
    rows.foreach { r =>
      val want = byFile(r.getString(0))
      val got = DirSink.bucketId(if (r.isNullAt(1)) null else r.get(1), spec.n)
      assert(got == want,
        s"row key ${r.get(1)} in file ${r.getString(0)} hashes to $got, " +
          s"file is tagged $want")
    }
  }

  test("bucketed write: k= tags, file purity, round-trip equality, null keys to bucket 0") {
    import spark.implicits._
    val dir = tmpDir()
    val df = spark.range(200).toDF("id")
      .select(when($"id" % 37 === 0, lit(null).cast("long"))
        .otherwise($"id").as("k"),
        concat(lit("v"), $"id").as("v"))
    df.repartition(4).write.format(fmt).option("path", dir)
      .option("bucket", "k:8").mode(SaveMode.Append).save()
    assert(DirSink.zoneBucket(dir).contains(DirSink.BucketSpec("k", 8)))
    assertPure(dir, "k")
    // round-trip: exact same multiset of rows
    val got = read(dir).collect().map(r =>
      (Option(r.get(0)), r.getString(1))).sortBy(_._2)
    val want = df.collect().map(r =>
      (Option(r.get(0)), r.getString(1))).sortBy(_._2)
    assert(got.toSeq == want.toSeq)
    // null keys landed in bucket 0's files
    val nulls = read(dir).filter($"k".isNull).select("_file").collect()
    val byFile = DirSink.readManifestEntries(dir).get._2
      .map(e => e.name -> e.bucket.get).toMap
    assert(nulls.nonEmpty && nulls.forall(r => byFile(r.getString(0)) == 0))
  }

  test("append inherits the layout; a mismatched bucket option is an error; truncate may re-bucket") {
    import spark.implicits._
    val dir = tmpDir()
    def df = spark.range(50).toDF("k").withColumn("v", $"k" * 2)
    df.write.format(fmt).option("path", dir)
      .option("bucket", "k:4").mode(SaveMode.Append).save()
    // bare append inherits
    df.write.format(fmt).option("path", dir).mode(SaveMode.Append).save()
    assertPure(dir, "k")
    // conflicting layout refused
    val e = intercept[Exception] {
      df.write.format(fmt).option("path", dir)
        .option("bucket", "k:8").mode(SaveMode.Append).save()
    }
    assert(e.getMessage.contains("bucket purity"))
    // a bucketed append onto an UNBUCKETED zone is refused too
    val plain = tmpDir()
    df.write.format(fmt).option("path", plain).mode(SaveMode.Append).save()
    val e2 = intercept[Exception] {
      df.write.format(fmt).option("path", plain)
        .option("bucket", "k:4").mode(SaveMode.Append).save()
    }
    assert(e2.getMessage.contains("bucket purity"))
    // truncate re-buckets; bucket=none drops the layout
    df.write.format(fmt).option("path", dir)
      .option("bucket", "k:2").mode(SaveMode.Overwrite).save()
    assert(DirSink.zoneBucket(dir).contains(DirSink.BucketSpec("k", 2)))
    assertPure(dir, "k")
    df.write.format(fmt).option("path", dir)
      .option("bucket", DirSink.BucketNone).mode(SaveMode.Overwrite).save()
    assert(DirSink.zoneBucket(dir).isEmpty)
  }

  test("bucket pruning: equality/IN on the bucket column plans only the matching buckets' files") {
    import spark.implicits._
    val dir = tmpDir()
    spark.range(400).toDF("k").withColumn("v", $"k" * 3)
      .repartition(2).write.format(fmt).option("path", dir)
      .option("bucket", "k:8").mode(SaveMode.Append).save()
    val (_, entries) = DirSink.readManifestEntries(dir).get
    val nFiles = entries.size
    // k = 13 hashes to bucket 13 % 8 = 5: only that bucket's files plan
    val q = read(dir).filter($"k" === 13L)
    assert(q.count() == 1)
    val scan = scanOf(q)
    scan.planInputPartitions()
    val b5 = entries.count(_.bucket.contains(5))
    assert(b5 < nFiles, "fixture must spread files across buckets")
    assert(scan.lastPlannedFiles.exists(n => n > 0 && n <= b5),
      s"k=13 must plan within bucket 5's $b5 files of $nFiles, " +
        s"planned=${scan.lastPlannedFiles}")
    // IN over two buckets: bucket pruning caps the plan at those
    // buckets' files (min/max stats may prune further — composition)
    val q2 = read(dir).filter($"k".isin(13L, 14L))
    assert(q2.count() == 2)
    val scan2 = scanOf(q2)
    scan2.planInputPartitions()
    val b56 = entries.count(e =>
      e.bucket.contains(5) || e.bucket.contains(6))
    assert(scan2.lastPlannedFiles.exists(n => n > 0 && n <= b56),
      s"IN(13,14) must plan within buckets 5+6's $b56 files, " +
        s"planned=${scan2.lastPlannedFiles}")
  }

  /** Two catalog tables bucketed on the join key with equal counts:
    * the join must plan with ZERO shuffle exchanges (SPJ) and still
    * produce exactly the rows a plain join does. */
  test("storage-partitioned join: equal-bucketed zones join without a shuffle") {
    import spark.implicits._
    val wh = tmpDir()
    val cat = s"bktcat_${math.abs(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.facts (k BIGINT, amount BIGINT) " +
      s"PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.db.dims (k BIGINT, tag STRING) " +
      s"PARTITIONED BY (bucket(8, k))")
    spark.range(300).select(($"id" % 60).as("k"), ($"id" * 7).as("amount"))
      .writeTo(s"$cat.db.facts").append()
    spark.range(60).select($"id".as("k"),
      concat(lit("t"), $"id" % 5).as("tag"))
      .writeTo(s"$cat.db.dims").append()
    assertPure(s"$wh/db/facts", "k")
    assertPure(s"$wh/db/dims", "k")

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        s"""SELECT d.tag, count(*) AS n, sum(f.amount) AS total
           |FROM $cat.db.facts f JOIN $cat.db.dims d ON f.k = d.k
           |GROUP BY d.tag ORDER BY d.tag""".stripMargin)
      val rows = joined.collect()
      // correctness against a recomputed plain join
      val facts = spark.range(300)
        .select(($"id" % 60).as("k"), ($"id" * 7).as("amount"))
      val dims = spark.range(60).select($"id".as("k"),
        concat(lit("t"), $"id" % 5).as("tag"))
      val want = facts.join(dims, "k").groupBy("tag")
        .agg(count(lit(1)).as("n"), sum("amount").as("total"))
        .orderBy("tag").collect()
      assert(rows.map(_.toString).toSeq == want.map(_.toString).toSeq)
      // plan shape: the join itself must consume the scans WITHOUT an
      // exchange — the aggregate above it may still shuffle, so count
      // exchanges BELOW the join node. AQE stays ON (the production
      // shape): expand adaptive plans and query stages while walking.
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p.children.flatMap(allNodes) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => allNodes(q.plan)
          case _ => Seq.empty
        }))
      val plan = joined.queryExecution.executedPlan
      val joinNode = allNodes(plan).collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.getOrElse(fail(s"no shuffled join found in:\n$plan"))
      val shufflesUnderJoin = allNodes(joinNode).drop(1).collect {
        case e: ShuffleExchangeLike => e
      }
      assert(shufflesUnderJoin.isEmpty,
        s"storage-partitioned join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  /** One side missing buckets entirely (sparse keys): Spark's
    * push-part-values alignment must keep the join CORRECT — the
    * empty buckets simply produce no pairs. Correctness is the
    * assertion here (plan shape may or may not stay shuffle-free
    * depending on alignment config; wrong rows never may). */
  test("sparse buckets: sides with different bucket populations join correctly") {
    import spark.implicits._
    val wh = tmpDir()
    val cat = s"bktsparse_${math.abs(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.a (k BIGINT, x BIGINT) " +
      s"PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.db.b (k BIGINT, y BIGINT) " +
      s"PARTITIONED BY (bucket(8, k))")
    // a: only even keys (buckets 0,2,4,6); b: keys 0..5 (buckets 0..5)
    spark.range(40).select(($"id" * 2 % 16).as("k"), $"id".as("x"))
      .writeTo(s"$cat.db.a").append()
    spark.range(24).select(($"id" % 6).as("k"), ($"id" + 100).as("y"))
      .writeTo(s"$cat.db.b").append()
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val got = spark.sql(
        s"""SELECT a.k, count(*) AS n FROM $cat.db.a a
           |JOIN $cat.db.b b ON a.k = b.k GROUP BY a.k ORDER BY a.k"""
          .stripMargin).collect().map(r => (r.getLong(0), r.getLong(1)))
      // keys in both: 0, 2, 4 — a has 5 rows each (40 ids over 8 even
      // keys), b has 4 rows each (24 ids over 6 keys) => 20 pairs each
      assert(got.toSeq == Seq((0L, 20L), (2L, 20L), (4L, 20L)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("maintenance preserves the layout: compact, DELETE rewrite, and UPDATE keep purity") {
    import spark.implicits._
    val dir = tmpDir()
    spark.range(300).toDF("k")
      .withColumn("v", ($"k" % 10).cast("long"))
      .repartition(3).write.format(fmt).option("path", dir)
      .option("bucket", "k:4").mode(SaveMode.Append).save()
    DirSink.compact(spark, dir, targetFiles = 2)
    assert(DirSink.zoneBucket(dir).contains(DirSink.BucketSpec("k", 4)),
      "compact must keep the bucket header")
    assertPure(dir, "k")
    assert(read(dir).count() == 300)
    // a DELETE on a non-bucket column forces copy-on-write rewrites —
    // the rewritten files must stay bucket-pure
    val cat = s"bktdml_${math.abs(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir + "_wh")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v BIGINT) " +
      s"PARTITIONED BY (bucket(4, k))")
    spark.range(300).select($"id".as("k"), ($"id" % 10).as("v"))
      .writeTo(s"$cat.db.t").append()
    val tdir = dir + "_wh/db/t"
    spark.sql(s"DELETE FROM $cat.db.t WHERE v = 3")
    assert(spark.table(s"$cat.db.t").count() == 270)
    assertPure(tdir, "k")
    spark.sql(s"UPDATE $cat.db.t SET v = v + 100 WHERE v = 4")
    assert(spark.table(s"$cat.db.t").filter($"v" === 104).count() == 30)
    assertPure(tdir, "k")
  }
}

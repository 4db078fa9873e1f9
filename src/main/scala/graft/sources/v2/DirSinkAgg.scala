package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** DISTRIBUTED METADATA-AGGREGATE FOLD — the [[DirSinkPrune]] shape
  * applied to pushed aggregates (round-14 verdict task 4).
  *
  * `SELECT count(*) / count(c) / min(c) / max(c) FROM zone` is answered
  * from per-file manifest facts (rows + encoded stats). As a driver
  * loop that fold is O(files) string parsing per query — fine at
  * 10³–10⁴ entries, a planning bottleneck at the 10⁶-entry 100 TB zone
  * shape. Above the same threshold the prune job uses, the fold runs
  * as a SPARK JOB over the commit log's columnar checkpoint sidecar:
  *
  *   - executors parse each sidecar row's stats into a per-file
  *     [[AggFacts]] partial and `reduce` them — a tree of merges whose
  *     driver-side result is ONE partial, never the entry list;
  *   - files REMOVED since the checkpoint are anti-joined out by the
  *     replay's `recentRemoves` set (O(delta) names, broadcast with
  *     the closure) — a stale sidecar row can never contribute a
  *     phantom bound;
  *   - files ADDED since the checkpoint (the ≤ interval-1 segment
  *     sliver, `recentAdds`) fold on the driver and MERGE with the
  *     job's partial;
  *   - the per-file partial ([[factsOf]]) and the merge ([[merge]])
  *     are ONE definition shared by the loop, the job, and the sliver,
  *     so the three can never disagree (the [[DirSinkPrune.survives]]
  *     discipline) — MetadataAggSpec pins job == loop bit-equality;
  *   - a missing sidecar falls back to the loop: the job path is an
  *     optimization with a proof obligation, never a correctness
  *     dependency.
  */
object DirSinkAgg {

  /** Test/probe observables, the [[DirSinkPrune]] pattern. */
  @volatile private[graft] var lastMode: String = "loop"
  @volatile private[graft] var lastEntries: Int = 0

  /** Per-column facts of one file (or a merge of files), for ONE
    * aggregated column:
    *   - `proved`: every covered file has usable stats for the column
    *     (or carries no rows) — min/max/count(col) refuse without it;
    *   - `noNull`: stats PROVE no null anywhere (count(col) law);
    *   - `min`/`max`: encoded bound over the files that have values
    *     (None = no non-null value anywhere → SQL NULL);
    *   - `nulls`: the column's KNOWN null total (round 15 — no-null
    *     files contribute 0, counted partial-null lines their count,
    *     all-null files their row count; a single legacy line without
    *     a count poisons to None and `count(col)` refuses). */
  case class ColFacts(proved: Boolean, noNull: Boolean,
                      min: Option[String], max: Option[String],
                      nulls: Option[Long] = None)

  /** The whole partial: total rows + one [[ColFacts]] per aggregated
    * column (positions align with the requested column indices). */
  case class AggFacts(rows: Long, cols: IndexedSeq[ColFacts])

  /** The per-file partial — THE definition shared by loop, job, and
    * sliver. `colIdx` are the schema positions of the aggregated
    * columns; `nCols` is the schema width (stats are positional). */
  def factsOf(rows: Long, stats: Option[String], nCols: Int,
              colIdx: IndexedSeq[Int],
              dvCard: Option[Long] = None): AggFacts = {
    // a DELETION-VECTORED file (round 15): count(*) knows its live
    // rows exactly (physical − cardinality), but the per-column facts
    // describe PHYSICAL rows — a deleted row may hold the extremum or
    // the null, so min/max/count(col) refuse on this file
    dvCard.filter(_ > 0L).foreach { c =>
      return AggFacts(rows - c, colIdx.map(_ =>
        ColFacts(proved = false, noNull = false, None, None, None)))
    }
    if (rows == 0L) // empty file: contributes count 0 and no values
      return AggFacts(0L, colIdx.map(_ =>
        ColFacts(proved = true, noNull = true, None, None, Some(0L))))
    stats match {
      case None => // pre-stats line: refuses everything but count(*)
        AggFacts(rows, colIdx.map(_ =>
          ColFacts(proved = false, noNull = false, None, None, None)))
      case Some(field) =>
        val st = DirSinkStats.parse(field, nCols)
        AggFacts(rows, colIdx.map { i =>
          val c = st(i)
          if (c.disabled)
            ColFacts(proved = false, noNull = false, None, None, None)
          else {
            // an all-null column's nulls ARE the file's rows — parse
            // cannot see the row count, the fold can
            val nulls =
              if (c.min.isEmpty && c.hasNull) Some(rows) else c.nullCount
            ColFacts(proved = true, noNull = !c.hasNull, c.min, c.max, nulls)
          }
        })
    }
  }

  /** Commutative, associative merge — the reduce the job runs on
    * executors and the driver runs over the sliver. `dts` are the
    * aggregated columns' data types (bound comparison is typed). */
  def merge(a: AggFacts, b: AggFacts, dts: IndexedSeq[DataType]): AggFacts =
    AggFacts(a.rows + b.rows,
      a.cols.indices.map { k =>
        val (x, y) = (a.cols(k), b.cols(k))
        def pick(wantMin: Boolean): Option[String] = {
          val (xv, yv) = (if (wantMin) x.min else x.max,
            if (wantMin) y.min else y.max)
          (xv, yv) match {
            case (Some(p), Some(q)) =>
              val takeX = if (wantMin) !DirSinkStats.boundLt(dts(k), q, p)
                          else !DirSinkStats.boundLt(dts(k), p, q)
              Some(if (takeX) p else q)
            case _ => xv.orElse(yv)
          }
        }
        ColFacts(x.proved && y.proved, x.noNull && y.noNull,
          pick(wantMin = true), pick(wantMin = false),
          for (p <- x.nulls; q <- y.nulls) yield p + q)
      })

  /** Identity element of [[merge]]. */
  def empty(nAggCols: Int): AggFacts =
    AggFacts(0L, IndexedSeq.fill(nAggCols)(
      ColFacts(proved = true, noNull = true, None, None, Some(0L))))

  /** The combined facts over the zone's visible entries: a driver loop
    * below the prune threshold (or without a usable sidecar), the
    * sidecar job + recent-adds sliver above it. ONE output shape — the
    * caller ([[DirSinkScanBuilder]]'s `computeAgg`) builds the pushed
    * row from it without knowing which path ran. */
  private[v2] def facts(path: String, m: DirSink.Manifest,
                        entries: Seq[DirSink.FileEntry],
                        schema: StructType,
                        colIdx: IndexedSeq[Int]): AggFacts = {
    lastEntries = entries.size
    val spark = SparkSession.active
    val threshold = scala.util.Try(
      spark.conf.get(DirSinkPrune.ThresholdKey,
        DirSinkPrune.DefaultThreshold.toString).toInt)
      .getOrElse(DirSinkPrune.DefaultThreshold)
    val dts: IndexedSeq[DataType] = colIdx.map(schema(_).dataType)
    def loopOver(es: Seq[DirSink.FileEntry]): AggFacts =
      es.foldLeft(empty(colIdx.size))((acc, e) =>
        merge(acc, factsOf(e.rows, e.stats, schema.length, colIdx,
          e.dv.map(_._2)), dts))
    if (entries.size >= threshold && m.ckptBase.isDefined) {
      // anti-join BOTH sets out of the sidecar: removed names are
      // stale, and every recentAdds name's LIVE version folds in the
      // driver sliver below — a RETAGGED file (DV DELETE / delta DML
      // re-adds the same name) appears in both, and excluding it here
      // is what stops its physical rows double-counting
      factsJob(spark, path, m.ckptBase.get,
        m.recentRemoves ++ m.recentAdds, schema, colIdx, dts) match {
        case Some(jobFacts) =>
          lastMode = "job"
          // the post-checkpoint sliver folds on the driver and merges in
          return merge(jobFacts,
            loopOver(entries.filter(e => m.recentAdds.contains(e.name))),
            dts)
        case None => () // sidecar missing — fall through
      }
    }
    lastMode = "loop"
    loopOver(entries)
  }

  /** The job path, callable directly (MetadataAggSpec and the probe
    * drive it without a scan): per-file partials and the reduce run on
    * EXECUTORS over the columnar sidecar, stale rows anti-joined out by
    * the O(delta) `removed` set; the driver receives one partial.
    * None iff the sidecar file does not exist. */
  private[graft] def factsJob(spark: SparkSession, path: String,
                              ckptGen: Long, removed: Set[String],
                              schema: StructType,
                              colIdx: IndexedSeq[Int],
                              dts: IndexedSeq[DataType]): Option[AggFacts] = {
    val sidecar = new Path(DirSinkLog.logPath(path),
      DirSinkLog.parquetCheckpointName(ckptGen))
    if (!DirSink.fs(path).exists(sidecar)) return None
    val nCols = schema.length
    val idx = colIdx
    val types = dts
    val gone = removed
    import spark.implicits._
    // per-file partials + per-partition reduce on executors; the
    // driver merges ONE partial per partition (tuple encoder only —
    // AggFacts travels as a plain case class through the RDD layer)
    val raw = spark.read.parquet(sidecar.toString)
    // pre-round-15 sidecars have no dvcard column; their zones also
    // have no vectors (a vector commit lands AFTER the checkpoint and
    // rides the recentAdds driver sliver until the next one)
    val withCard =
      if (raw.columns.contains("dvcard")) raw
      else raw.withColumn("dvcard",
        org.apache.spark.sql.functions.lit(null)
          .cast(org.apache.spark.sql.types.LongType))
    val perPartition = withCard
      .select("name", "rows", "stats", "dvcard")
      .as[(String, Long, String, Option[Long])]
      .rdd
      .filter(t => !gone.contains(t._1))
      .map(t => factsOf(t._2, Option(t._3), nCols, idx, t._4))
      .mapPartitions(it =>
        if (it.hasNext) Iterator.single(it.reduce(merge(_, _, types)))
        else Iterator.empty)
      .collect()
    Some(if (perPartition.isEmpty) empty(idx.size)
         else perPartition.reduce(merge(_, _, types)))
  }
}

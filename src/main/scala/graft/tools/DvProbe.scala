package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In}
import org.apache.spark.sql.types.StructType
import graft.sources.v2.{DirSink, DirSinkDv, DirSinkTable}

/** WRITE-COST PROBE for the two DELETE strategies (round-15 evidence):
  * copy-on-write rewrites every stats-undecided file; deletion
  * vectors write one position bitmap per touched file. The asymmetry
  * this measures is the design's whole point — a SCATTERED delete
  * (one row in every file: the GDPR-erasure / takedown-list shape)
  * costs CoW the entire zone and costs vectors a few KB, and the gap
  * widens linearly with zone size.
  *
  * Per zone size the probe builds TWO identical zones (parquet plane,
  * `files` files × `rowsPer` rows), deletes the same `perFile`
  * scattered ids from every file both ways, and reports wall time and
  * bytes written (new data files for CoW, `_dv` members for vectors),
  * then verifies both sides return the same surviving row count —
  * the probe is also an end-to-end equality check at sizes the unit
  * specs don't reach.
  *
  * Usage: `runMain graft.tools.DvProbe [maxFiles]` (default 64;
  * sweeps files = 4, 16, maxFiles at 10k rows/file). */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val maxFiles = args.headOption.map(_.toInt).getOrElse(64)
    val spark = graft.Sessions.local(appName = "graft-dv-probe")
    val rowsPer = 10000
    val perFile = 3 // scattered ids deleted per file

    def build(files: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("dvprobe").toString
      (0 until files).foreach { k =>
        spark.range(k.toLong * rowsPer, (k + 1).toLong * rowsPer)
          .select(col("id"), (col("id") % 97).as("v"),
            concat(lit("payload-"), col("id")).as("s"))
          .coalesce(1)
          .write.format("graft.sources.v2.DirSinkSource")
          .option("path", dir).mode(SaveMode.Append).save()
      }
      dir
    }

    def dataBytes(dir: String): Long =
      new java.io.File(dir).listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).map(_.length).sum

    def dvBytes(dir: String): Long = {
      val d = new java.io.File(dir, DirSinkDv.DirName)
      if (!d.exists()) 0L
      else d.listFiles().map(_.length).sum
    }

    println("[dvprobe] files rows cow_ms cow_bytes dv_ms dv_bytes " +
      s"(scattered delete: $perFile ids/file; bytes = rewrite output " +
      "vs vector members)")
    Seq(4, 16, maxFiles).distinct.filter(_ > 0).foreach { files =>
      val ids: Array[Long] = (0 until files).flatMap(k =>
        (1 to perFile).map(j =>
          k.toLong * rowsPer + j * (rowsPer / (perFile + 1)))).toArray
      val pred = Array[Filter](In("id", ids.map(_.asInstanceOf[AnyRef])))
      val schema = StructType.fromDDL("id BIGINT, v BIGINT, s STRING")

      val cowDir = build(files)
      val preBytes = dataBytes(cowDir)
      val t0 = System.nanoTime()
      new DirSinkTable(cowDir, schema).deleteWhere(pred)
      val cowMs = (System.nanoTime() - t0) / 1e6
      // CoW write cost: everything on disk beyond the original files
      // (superseded files stay for time travel, so new = post − 0 of
      // removed; measure as post-delete total minus pre-delete total
      // plus the superseded originals still present)
      val cowNew = dataBytes(cowDir) - preBytes

      val dvDir = build(files)
      spark.conf.set(DirSinkDv.EnabledKey, "true")
      val t1 = System.nanoTime()
      try new DirSinkTable(dvDir, schema).deleteWhere(pred)
      finally spark.conf.unset(DirSinkDv.EnabledKey)
      val dvMs = (System.nanoTime() - t1) / 1e6
      val dvB = dvBytes(dvDir)

      val cowCount = spark.read.format("graft.sources.v2.DirSinkSource")
        .option("path", cowDir).load().count()
      val dvCount = spark.read.format("graft.sources.v2.DirSinkSource")
        .option("path", dvDir).load().count()
      require(cowCount == dvCount &&
        cowCount == files.toLong * rowsPer - ids.length,
        s"strategy mismatch: cow=$cowCount dv=$dvCount " +
          s"expected=${files.toLong * rowsPer - ids.length}")
      println(f"[dvprobe] $files%5d ${files.toLong * rowsPer}%8d " +
        f"$cowMs%8.1f $cowNew%10d $dvMs%8.1f $dvB%8d")
    }
    spark.stop()
  }
}

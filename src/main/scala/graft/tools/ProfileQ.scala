package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Where does a declared query's wall-clock go? Runs each named query
  * twice (the bench discipline) and prints, for the SECOND pass, every
  * Spark job's duration plus the driver-side gap between jobs — the gap
  * total is planning/analysis/broadcast-build time that no stage metric
  * shows. `runMain graft.tools.ProfileQ <sfDir> <query...>`. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.schemas.keys.foreach { t =>
      graft.sources.Tables.load(spark, dir, t).count()
    }
    case class J(id: Int, start: Long, desc: String, var end: Long = 0L,
                 var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.ArrayBuffer.empty[J]
    var stageCount = 0
    var taskCount = 0
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          jobs += J(e.jobId, e.time, d)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageCount += 1; taskCount += e.stageInfo.numTasks
          val si = e.stageInfo
          val dur = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          if (dur >= 100)
            println(f"    stage ${si.stageId}%4d ${dur / 1e3}%6.2fs " +
              f"tasks=${si.numTasks}%3d  ${si.name.take(90)}")
        }
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm pass
      spark.sparkContext.addSparkListener(listener)
      jobs.clear(); stageCount = 0; taskCount = 0
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // deterministic drain (not a fixed sleep): late job/stage-end
      // events would under-count jobSum and inflate "gaps"
      org.apache.spark.ListenerDrain.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.sortBy(_.start).toSeq
      val jobTotal = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      println(f"\n[profile] $name wall=$wall%.2fs jobs=${js.size} " +
        f"stages=$stageCount tasks=$taskCount jobSum=$jobTotal%.2fs " +
        f"gaps=${wall - jobTotal}%.2fs")
      var prevEnd = 0L
      js.foreach { j =>
        val gap = if (prevEnd == 0L) 0L else math.max(0L, j.start - prevEnd)
        prevEnd = math.max(prevEnd, j.end)
        val durMs = math.max(0L, j.end - j.start)
        if (durMs >= 20 || gap >= 20)
          println(f"  job ${j.id}%4d dur=${durMs / 1e3}%6.2fs gapBefore=${gap / 1e3}%6.2fs  ${j.desc}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiler: run named queries (after a warm pass) with a listener that
  * attributes wall time to jobs and stages — task-time sums, shuffle bytes,
  * input bytes — so per-query cost is explainable without the UI.
  * Usage: runMain graft.tools.Prof <sfDir> <query ...>
  */
object Prof {
  final case class StageAgg(
      var name: String = "",
      var details: String = "",
      var taskTimeMs: Long = 0,
      var deserMs: Long = 0,
      var gcMs: Long = 0,
      var tasks: Int = 0,
      var inputBytes: Long = 0,
      var shuffleReadBytes: Long = 0,
      var shuffleWriteBytes: Long = 0,
      var wallMs: Long = 0)

  class Listener extends SparkListener {
    val jobs = mutable.ArrayBuffer[(Int, Long, String)]() // id, durMs, desc
    val stages = mutable.LinkedHashMap[Int, StageAgg]()
    private val jobStart = mutable.Map[Int, (Long, String)]()

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobStart(e.jobId) = (e.time, desc)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      jobStart.remove(e.jobId).foreach { case (t0, desc) =>
        jobs += ((e.jobId, e.time - t0, desc))
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val agg = stages.getOrElseUpdate(si.stageId, StageAgg())
      agg.name = si.name
      agg.details = si.details.linesIterator
        .find(l => l.contains("graft") && !l.contains("Prof")).getOrElse("").trim
      agg.tasks += si.numTasks
      agg.wallMs += (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(0L)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val agg = stages.getOrElseUpdate(e.stageId, StageAgg())
      val m = e.taskMetrics
      if (m != null) {
        agg.taskTimeMs += m.executorRunTime
        agg.deserMs += m.executorDeserializeTime
        agg.gcMs += m.jvmGCTime
        agg.inputBytes += m.inputMetrics.bytesRead
        agg.shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
        agg.shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = { jobs.clear(); stages.clear(); jobStart.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      // committer v2 + no _SUCCESS: engine-session setting, rationale at
      // Main.scala's builder (manifest-level visibility)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      // speculation pinned off: the v2-committer + post-job manifest
      // listing contract assumes one committed attempt per task (see
      // Main.scala's builder for the full rationale)
      .config("spark.speculation", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new Listener
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm pass (per-shape init), unprofiled
      fn(spark, sfDir).count() // second warm pass = bench steady state
      spark.sparkContext.addSparkListener(listener)
      listener.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"%n===== $n wall=$wall%.3f s jobs=${listener.jobs.size} =====")
      val jobTotal = listener.jobs.map(_._2).sum
      println(f"job wall sum=${jobTotal / 1000.0}%.3f s (gaps = driver work: planning, footer IO, fs ops)")
      listener.jobs.sortBy(-_._2).take(15).foreach { case (id, ms, desc) =>
        println(f"  job $id%3d ${ms / 1000.0}%7.3f s  $desc")
      }
      println("  top stages by task-time:")
      listener.stages.toSeq.sortBy(-_._2.wallMs).take(20).foreach { case (sid, a) =>
        println(f"  stage $sid%4d wall=${a.wallMs / 1000.0}%7.3f task=${a.taskTimeMs / 1000.0}%8.3f " +
          f"deser=${a.deserMs / 1000.0}%7.3f gc=${a.gcMs / 1000.0}%6.3f " +
          f"tasks=${a.tasks}%4d in=${a.inputBytes / 1e6}%6.1f sr=${a.shuffleReadBytes / 1e6}%6.1f " +
          f"sw=${a.shuffleWriteBytes / 1e6}%6.1f  ${a.details.take(90)}")
      }
    }
    spark.stop()
  }
}

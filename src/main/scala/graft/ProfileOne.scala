package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev utility (optimization rounds): run one named query with a
  * SparkListener attached and print a per-job wall-time breakdown —
  * where a multi-action query (streaming drains, staged builds,
  * foreachBatch bodies) actually spends its time. Usage:
  *   runMain graft.ProfileOne <queryName> [sfDir]
  * Prints: each job's id, wall ms, total task ms, stage count and the
  * job's call-site description, sorted by wall time; then the gap time
  * (wall outside any job — driver work, streaming machinery, fs I/O).
  * Not part of the driver contract; measurement tooling only. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen + any stageOnce artifacts, so the profiled
    // pass measures the steady-state query, not one-time staging
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    try { fn(spark, sfDir).queryExecution.executedPlan.execute().count() }
    catch { case e: Throwable => System.err.println(s"[profile] warm pass failed: ${e.getMessage}") }

    case class Job(id: Int, var desc: String = "", var t0: Long = 0L,
      var t1: Long = 0L, var taskMs: Long = 0L, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = jobs.getOrElseUpdate(e.jobId, Job(e.jobId))
        j.t0 = e.time
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        j.stages += e.stageIds.size
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(e.stageInfo.stageId); j <- jobs.get(jid))
            j.taskMs += e.stageInfo.taskMetrics.executorRunTime
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n = df.queryExecution.executedPlan.execute().count()
    val wallMs = (System.nanoTime() - t0) / 1e6
    spark.sparkContext.listenerBus.waitUntilEmpty()
    val snap = jobs.synchronized { jobs.values.toVector }
    val done = snap.filter(j => j.t1 > 0 && j.t0 > 0)
    println(f"[profile] $name rows=$n wall=${wallMs / 1000}%.2f s jobs=${snap.size}")
    // wall covered by jobs (union of intervals) vs gap (driver/fs time)
    val ivs = done.map(j => (j.t0, j.t1)).sortBy(_._1)
    var covered = 0L; var cur: Option[(Long, Long)] = None
    for ((a, b) <- ivs) cur match {
      case Some((c0, c1)) if a <= c1 => cur = Some((c0, math.max(c1, b)))
      case Some((c0, c1)) => covered += c1 - c0; cur = Some((a, b))
      case None => cur = Some((a, b))
    }
    cur.foreach { case (c0, c1) => covered += c1 - c0 }
    println(f"[profile] job-covered=${covered / 1000.0}%.2f s  gap=${wallMs / 1000 - covered / 1000.0}%.2f s")
    done.sortBy(j => -(j.t1 - j.t0)).take(40).foreach { j =>
      println(f"[profile]   job=${j.id}%4d wall=${(j.t1 - j.t0) / 1000.0}%7.2f s task=${j.taskMs / 1000.0}%7.2f s stages=${j.stages}%2d  ${j.desc.take(110)}")
    }
    spark.stop()
  }
}

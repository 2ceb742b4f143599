package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiler: per-query Spark JOB / STAGE / TASK counts plus wall
  * time under the exact Bench session config. At bench SFs (and per
  * scheduler barrier at cluster scale) the dominant cost of most
  * queries is the NUMBER of actions/stages, not the data — this main
  * makes that count visible so the optimization rounds can attack it
  * (OPTIMIZATION_r15.md "materialization-action count" lever; the
  * StreamProbe precedent of a committed, reproducible diagnostic).
  *
  * Run: `sbt "runMain graft.JobProf <sfDir> q1,q2,..."` — one prime
  * (codegen/JIT) then one counted+timed run per query, runner-side
  * clearCache between queries (the bench cadence).
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: JobProf <sfDir> <q1,q2,...>")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
    // A/B conf overrides for profiling experiments, e.g.
    // GRAFT_JOBPROF_CONF="spark.sql.adaptive.enabled=false;spark.x=y"
    sys.env.get("GRAFT_JOBPROF_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val verbose = sys.env.get("GRAFT_JOBPROF_VERBOSE").contains("1")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val label = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .map(d => s"[$d] ").getOrElse("")
          val desc = label + j.stageInfos.map(_.name).distinct.mkString(" | ").take(180)
          jobStartNs.put(j.jobId, (System.nanoTime(), desc)); ()
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) {
          Option(jobStartNs.remove(e.jobId)).foreach { case (t0, desc) =>
            println(f"[jobprof-job] id=${e.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $desc")
          }
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) { taskMs.addAndGet(t.taskInfo.duration); () }
      }
    })
    names.foreach { n =>
      SparkEntry.queries(n)(spark, dir).count() // prime
      spark.catalog.clearCache()
      // listener events are async: give the prime's tail a beat to drain
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobprof] $n%-28s wall=$wall%7.2fs jobs=${jobs.get}%4d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%6d taskTime=${taskMs.get / 1000.0}%8.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

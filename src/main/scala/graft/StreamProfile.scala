package graft

import graft.streaming.ScoringStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Latency profiler for the streaming write path: splits one trigger into
  * plan-build (DataFrame construction + analysis), store-write (execute +
  * parquet commit), and engine overhead (offset/commit logs, micro-batch
  * planning), with a job-level task/scheduling split from a listener.
  * `runMain graft.StreamProfile [rowsPerBatch]`. Diagnostic only — the
  * shipped numbers come from [[StreamBench]].
  *
  * Findings this tool produced (round 9): a MemoryStream batch arrives as
  * ONE partition, so per-trigger cost is a single task; the pre-kernel
  * expression forest (getItem probes + zip_with/aggregate HOFs + to_json)
  * was ~200 ms/10k rows of that task, fixed by
  * [[graft.functions.LinearScoreAttr]]; a rebalancing `repartition`
  * WORSENS the trigger (the extra exchange stage costs more in per-trigger
  * driver planning/codegen than the parallelism returns at micro-batch
  * sizes); RawLocalFileSystem saves the .crc sidecar writes.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft-streamprof").toString
    val featureNames = (0 until 8).map(i => s"f$i")
    val coefs = featureNames.indices.map(i => 0.25 * (i % 3) - 0.1)
    val mu = Seq.fill(featureNames.size)(0.0)

    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")
    val store = new ScoringStream.ResultStore(s"$dir/store")

    val scoreMs = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val writeMs = new java.util.concurrent.ConcurrentLinkedQueue[Double]()

    // job-level split: submit->end wall, per-job task time sum/max, deser
    val jobWall = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val taskSum = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val taskMax = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val deserSum = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val tsum = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.DoubleAdder]()
      private val tmax = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.DoubleAdder]()
      private val dsum = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.DoubleAdder]()
      private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(e.jobId, System.nanoTime())
        tsum.put(e.jobId, new java.util.concurrent.atomic.DoubleAdder)
        tmax.put(e.jobId, new java.util.concurrent.atomic.DoubleAdder)
        dsum.put(e.jobId, new java.util.concurrent.atomic.DoubleAdder)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.getOrDefault(e.stageId, -1)
        if (jid >= 0 && e.taskMetrics != null) {
          tsum.get(jid).add(e.taskMetrics.executorRunTime.toDouble)
          dsum.get(jid).add(e.taskMetrics.executorDeserializeTime.toDouble)
          val m = tmax.get(jid)
          m.synchronized {
            if (e.taskMetrics.executorRunTime > m.sum()) {
              m.reset(); m.add(e.taskMetrics.executorRunTime.toDouble)
            }
          }
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(e.jobId)
        if (t0 != 0L) {
          jobWall.add((System.nanoTime() - t0) / 1e6)
          taskSum.add(Option(tsum.remove(e.jobId)).map(_.sum()).getOrElse(0.0))
          taskMax.add(Option(tmax.remove(e.jobId)).map(_.sum()).getOrElse(0.0))
          deserSum.add(Option(dsum.remove(e.jobId)).map(_.sum()).getOrElse(0.0))
        }
      }
    })

    val q = stream.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        val scored = ScoringStream.scoreBatch(batch, featureNames, coefs, mu, 0.05)
        val t1 = System.nanoTime()
        store.upsert(scored, batchId)
        val t2 = System.nanoTime()
        scoreMs.add((t1 - t0) / 1e6)
        writeMs.add((t2 - t1) / 1e6)
        ()
      }
      .start()

    val rowsPerBatch = args.headOption.map(_.toInt).getOrElse(10000)
    def oneBatch(b: Int): Double = {
      val rows = (0 until rowsPerBatch).map { i =>
        (s"t${b}_$i", featureNames.map(f => f -> ((i * 31 + b) % 97) / 97.0).toMap)
      }
      input.addData(rows)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e6
    }

    (0 until 3).foreach(oneBatch)
    scoreMs.clear(); writeMs.clear()
    jobWall.clear(); taskSum.clear(); taskMax.clear(); deserSum.clear()
    val total = (3 until 23).map(oneBatch)

    import scala.jdk.CollectionConverters._
    def stats(xs: Seq[Double], name: String): Unit = {
      val s = xs.sorted
      println(f"$name%-12s p50=${s(s.size / 2)}%8.1f  p95=${s(math.min(s.size - 1, (s.size * 0.95).toInt))}%8.1f  mean=${xs.sum / xs.size}%8.1f")
    }
    stats(total, "total")
    stats(scoreMs.asScala.toSeq, "plan-build")
    stats(writeMs.asScala.toSeq, "store-write")
    stats(jobWall.asScala.toSeq, "job-wall")
    stats(taskSum.asScala.toSeq, "task-sum")
    stats(taskMax.asScala.toSeq, "task-max")
    stats(deserSum.asScala.toSeq, "deser-sum")
    println(f"engine-rest  mean=${total.sum / total.size - scoreMs.asScala.sum / scoreMs.size() - writeMs.asScala.sum / writeMs.size()}%8.1f")
    q.stop()
    Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}

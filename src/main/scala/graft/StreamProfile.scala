package graft

import graft.streaming.ScoringStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Scratch profiler for the streaming write path: splits one trigger's
  * latency into score-plan-build / store-write / engine overhead (offset
  * log, commit log, micro-batch planning). Not part of the bench surface.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val total = (3 until 23).map(oneBatch)

    import scala.jdk.CollectionConverters._
    def stats(xs: Seq[Double], name: String): Unit = {
      val s = xs.sorted
      println(f"$name%-12s p50=${s(s.size / 2)}%8.1f  p95=${s(math.min(s.size - 1, (s.size * 0.95).toInt))}%8.1f  mean=${xs.sum / xs.size}%8.1f")
    }
    stats(total, "total")
    stats(scoreMs.asScala.toSeq, "plan-build")
    stats(writeMs.asScala.toSeq, "store-write")
    println(f"engine-rest  mean=${total.sum / total.size - scoreMs.asScala.sum / scoreMs.size() - writeMs.asScala.sum / writeMs.size()}%8.1f")
    q.stop()
    Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}

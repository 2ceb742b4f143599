package graft

import graft.streaming.ScoringStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Latency decomposition probe for the serving path — the diagnostic
  * behind the round-14 store-write trim. Isolates the per-trigger cost
  * into: the full attach path, the bare micro-batch machinery (empty
  * foreachBatch — offset/commit log + planning + progress, no job), a
  * count-only job, and the store write alone at 8 vs 1 output
  * partitions. Round-14 measurements at `local[32]`: machinery-nojob
  * p50 ≈ 250 ms (the floor nothing in this repo controls),
  * machinery+count ≈ 300 ms, store.upsert 8-part ≈ 290 ms vs 1-part
  * ≈ 215 ms — the 8-file commit was the one controllable constant,
  * hence ResultStore's default fan-out drop to 2. Run under load the
  * numbers inflate uniformly; read the final steal line
  * ([[HostStat]]) before trusting a comparison. */
object StreamProbe {
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

    val dir = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val featureNames = (0 until 8).map(i => s"f$i")
    val coefs = featureNames.indices.map(i => 0.25 * (i % 3) - 0.1)
    val mu = Seq.fill(featureNames.size)(0.0)
    def rows(b: Int, n: Int) = (0 until n).map { i =>
      (s"t${b}_$i", featureNames.map(f => f -> ((i * 31 + b) % 97) / 97.0).toMap)
    }
    def timeMs[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def p(label: String, xs: Seq[Double]): Unit = {
      val s = xs.sorted
      println(f"PROBE $label%-28s p50=${s(s.size / 2)}%7.1f p95=${s((s.size * 19) / 20)}%7.1f min=${s.head}%7.1f")
    }

    // A: full attach path (the StreamBench baseline config)
    {
      val input = MemoryStream[(String, Map[String, Double])]
      val store = new ScoringStream.ResultStore(s"$dir/a/store")
      val q = ScoringStream.attach(input.toDF().toDF("transaction_id", "features"),
        store, s"$dir/a/ckpt", featureNames, coefs, mu, intercept = 0.05)
      (0 until 3).foreach { b => input.addData(rows(b, 100)); q.processAllAvailable() }
      val lat = (3 until 23).map { b =>
        input.addData(rows(b, 100)); timeMs(q.processAllAvailable())
      }
      q.stop(); p("full-path(100rows)", lat)
    }

    // B: machinery only — same stream shape, foreachBatch counts and discards
    {
      val input = MemoryStream[(String, Map[String, Double])]
      val q = input.toDF().toDF("transaction_id", "features").writeStream
        .option("checkpointLocation", s"$dir/b/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          if (bid == 5) println(s"PROBE batch_partitions=${batch.rdd.getNumPartitions}")
          batch.count(); () }
        .start()
      (0 until 3).foreach { b => input.addData(rows(b, 100)); q.processAllAvailable() }
      val lat = (3 until 23).map { b =>
        input.addData(rows(b, 100)); timeMs(q.processAllAvailable())
      }
      q.stop(); p("machinery+count", lat)
    }

    // B2: machinery with an empty foreachBatch body — no job at all
    {
      val input = MemoryStream[(String, Map[String, Double])]
      val q = input.toDF().toDF("transaction_id", "features").writeStream
        .option("checkpointLocation", s"$dir/b2/ckpt")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      (0 until 3).foreach { b => input.addData(rows(b, 100)); q.processAllAvailable() }
      val lat = (3 until 23).map { b =>
        input.addData(rows(b, 100)); timeMs(q.processAllAvailable())
      }
      q.stop(); p("machinery-nojob", lat)
    }

    // C: the store write alone, batch mode (scored shape, 8-way coalesce)
    {
      val store = new ScoringStream.ResultStore(s"$dir/c/store")
      val base = rows(0, 100).toDF("transaction_id", "features")
      val scored = ScoringStream.scoreBatch(base, featureNames, coefs, mu, 0.05).cache()
      scored.count()
      val lat = (0 until 20).map(b => timeMs(store.upsert(scored, b.toLong)))
      p("store.upsert(100rows)", lat)
    }

    // D: the store write with 1 output partition
    {
      val store = new ScoringStream.ResultStore(s"$dir/d/store", maxWritePartitions = 1)
      val base = rows(0, 100).toDF("transaction_id", "features")
      val scored = ScoringStream.scoreBatch(base, featureNames, coefs, mu, 0.05).cache()
      scored.count()
      val lat = (0 until 20).map(b => timeMs(store.upsert(scored, b.toLong)))
      p("store.upsert(1part)", lat)
    }

    // E: full path with a 1-partition store
    {
      val input = MemoryStream[(String, Map[String, Double])]
      val store = new ScoringStream.ResultStore(s"$dir/e/store", maxWritePartitions = 1)
      val q = ScoringStream.attach(input.toDF().toDF("transaction_id", "features"),
        store, s"$dir/e/ckpt", featureNames, coefs, mu, intercept = 0.05)
      (0 until 3).foreach { b => input.addData(rows(b, 100)); q.processAllAvailable() }
      val lat = (3 until 23).map { b =>
        input.addData(rows(b, 100)); timeMs(q.processAllAvailable())
      }
      q.stop(); p("full-path(1part)", lat)
    }

    println(s"PROBE steal_total_ms=${HostStat.stealMs()}")
    spark.stop()
  }
}

package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The broker round-trip the reference gets from Celery-over-Redis
  * (api/app.py:243-245, docker-compose.yml:98): produce over a REAL
  * socket → Spark micro-batch source → kafka-shaped decode → score →
  * idempotent upsert — plus the source-level contracts (offset
  * checkpoint/restart resume, maxPerTrigger backpressure) that were
  * previously config-only claims on [[StreamOps.kafkaQueueSource]].
  */
class BrokerSourceSpec extends SparkSpec {
  import spark.implicits._

  private val feats = Seq("f0", "f1")
  private val coefs = Seq(1.0, -0.5)
  private val mu = Seq(0.0, 0.0)

  private def payload(tx: String, fs: (String, Double)*): Array[Byte] = {
    val fields = fs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"transaction_id":"$tx","features":{$fields}}""".getBytes(StandardCharsets.UTF_8)
  }

  private def brokerStream(broker: MiniBroker, topic: String,
      maxPerTrigger: Long = Long.MaxValue): DataFrame =
    spark.readStream.format(classOf[BrokerSourceProvider].getName)
      .option("host", "127.0.0.1")
      .option("port", broker.port)
      .option("topic", topic)
      .option("maxPerTrigger", maxPerTrigger)
      .load()

  test("produce -> fetch -> end over the wire protocol") {
    val broker = new MiniBroker()
    try {
      val client = new MiniBrokerClient("127.0.0.1", broker.port)
      assert(client.endOffset("t") === 0L) // subscribe-before-produce is fine
      assert(client.produce("t", "a".getBytes) === 0L)
      assert(client.produce("t", "b".getBytes) === 1L)
      assert(client.produce("other", "x".getBytes) === 0L) // topics are isolated
      assert(client.endOffset("t") === 2L)
      val got = client.fetch("t", 0L, 10)
      assert(got.map(_._1) === Seq(0L, 1L))
      assert(got.map(m => new String(m._2)) === Seq("a", "b"))
      assert(client.fetch("t", 1L, 10).map(m => new String(m._2)) === Seq("b"))
      client.close()
    } finally broker.close()
  }

  test("end-to-end: socket produce -> micro-batch source -> decode -> score -> idempotent store") {
    val broker = new MiniBroker()
    val store = new ScoringStream.ResultStore(
      Files.createTempDirectory("graft-broker-store").toString)
    try {
      val producer = new MiniBrokerClient("127.0.0.1", broker.port)
      producer.produce("txns", payload("b1", "f0" -> 2.0, "f1" -> 4.0))
      producer.produce("txns", payload("b2", "f0" -> 1.0))
      producer.produce("txns", "not json at all".getBytes(StandardCharsets.UTF_8))

      val decoded = StreamOps.kafkaQueueDecode(brokerStream(broker, "txns"))
      val q = ScoringStream.attach(decoded, store,
        Files.createTempDirectory("graft-broker-ckpt").toString,
        feats, coefs, mu, intercept = 0.0, metrics = new graft.api.Metrics.Registry)
      try q.processAllAvailable() finally q.stop()

      val snap = store.snapshot(spark)
        .select("transaction_id", "status").as[(String, String)].collect().toMap
      // the malformed payload decodes to null id/features (PERMISSIVE) and
      // FAILS per-row instead of killing the stream
      assert(snap === Map(("b1", "COMPLETED"), ("b2", "COMPLETED"), (null, "FAILED")))
      val b1 = store.snapshot(spark).filter($"transaction_id" === "b1").head()
      val margin = 1.0 * 2.0 - 0.5 * 4.0
      assert(math.abs(b1.getDouble(b1.fieldIndex("prediction_score"))
        - 1.0 / (1.0 + math.exp(-margin))) < 1e-5)
      producer.close()
    } finally broker.close()
  }

  test("checkpointed offsets resume after a restart: no reprocessing, new messages picked up") {
    val broker = new MiniBroker()
    val ckpt = Files.createTempDirectory("graft-broker-ckpt2").toString
    try {
      val producer = new MiniBrokerClient("127.0.0.1", broker.port)
      producer.produce("resume", payload("r1", "f0" -> 1.0))

      def runOnce(): Seq[(Long, String)] = {
        val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
        val q = brokerStream(broker, "resume").writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.select(col("value").cast("string")).as[String](spark.implicits.newStringEncoder)
              .collect().foreach(v => batches.add(batchId -> v))
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        import scala.jdk.CollectionConverters._
        batches.asScala.toSeq
      }

      val first = runOnce()
      assert(first.map(_._2).exists(_.contains("\"r1\"")))
      producer.produce("resume", payload("r2", "f0" -> 2.0))
      val second = runOnce()
      // the committed endpoint survived the restart: r1 is NOT re-read
      assert(second.map(_._2).forall(!_.contains("\"r1\"")))
      assert(second.map(_._2).exists(_.contains("\"r2\"")))
      producer.close()
    } finally broker.close()
  }

  test("maxPerTrigger splits a backlog into bounded micro-batches (ST6 backpressure)") {
    val broker = new MiniBroker()
    try {
      val producer = new MiniBrokerClient("127.0.0.1", broker.port)
      (0 until 10).foreach(i => producer.produce("bp", payload(s"m$i", "f0" -> i.toDouble)))

      val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = brokerStream(broker, "bp", maxPerTrigger = 3).writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-broker-ckpt3").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          sizes.add(batch.count()); ()
        }.start()
      try q.processAllAvailable() finally q.stop()

      import scala.jdk.CollectionConverters._
      val observed = sizes.asScala.toSeq.filter(_ > 0)
      assert(observed.sum === 10L)
      assert(observed.forall(_ <= 3L), s"batch over the admission cap: $observed")
      assert(observed.size >= 4) // 10 rows / cap 3 -> at least 4 triggers
      producer.close()
    } finally broker.close()
  }
}

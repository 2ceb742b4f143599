package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming tumbling window + watermark matches batch semantics (ST7)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.tumblingCounts(stream, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling_test").outputMode("append").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(11), "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the first windows
      input.addData((ts(59), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("window_start", "event_type", "n", "sum_value").collect()
      val byKey = rows.map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
      assert(byKey(("2024-01-01 10:00:00.0", "click")) === ((2L, 3.0)))
      assert(byKey(("2024-01-01 10:10:00.0", "view")) === ((1L, 3.0)))
    } finally q.stop()
  }

  test("streaming session window groups activity bursts (ST7)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val stream = input.toDF().toDF("ts", "user_id")
    val q = StreamOps.sessionCounts(stream, "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("session_test").outputMode("append").start()
    try {
      // user 1: burst of 3 within gaps < 5m; then silence; user 2: single
      input.addData((ts(0), 1L), (ts(2), 1L), (ts(4), 1L), (ts(1), 2L))
      q.processAllAvailable()
      input.addData((ts(30), 9L)) // advance watermark; close sessions
      q.processAllAvailable()
      val rows = spark.table("session_test").collect()
        .map(r => r.getLong(2) -> r.getLong(3)).toMap
      assert(rows(1L) === 3L)
      assert(rows(2L) === 1L)
    } finally q.stop()
  }

  test("file queue source feeds the scoring path at-least-once (S7/S8/ST6)") {
    val queueDir = tmp("graft-queue")
    val store = new ScoringStream.ResultStore(tmp("graft-queue-results"))
    StreamOps.enqueue(spark, queueDir, Seq(
      "m1" -> Map("f0" -> 1.0), "m2" -> Map("f1" -> 2.0)))
    val stream = StreamOps.fileQueueSource(spark, queueDir, maxFilesPerTrigger = 1)
    val q = ScoringStream.attach(stream, store, tmp("graft-queue-ckpt"),
      Seq("f0", "f1"), Seq(1.0, -1.0), Seq(0.0, 0.0), 0.0)
    try {
      q.processAllAvailable()
      StreamOps.enqueue(spark, queueDir, Seq("m3" -> Map("f0" -> 5.0)))
      q.processAllAvailable()
      val snap = store.snapshot(spark)
      assert(snap.select("transaction_id").as[String].collect().toSet === Set("m1", "m2", "m3"))
      assert(snap.filter(col("status") === "COMPLETED").count() === 3)
    } finally q.stop()
  }

  test("kafka-shaped queue source feeds the same scoring path (source factory swapped)") {
    implicit val sqlCtx = spark.sqlContext
    val store = new ScoringStream.ResultStore(tmp("graft-kafka-results"))
    // Kafka record shape: binary value carrying the JSON queue message —
    // exactly what format("kafka").load() emits, minus the broker
    val input = MemoryStream[Array[Byte]]
    input.addData(
      """{"transaction_id":"k1","features":{"f0":1.0}}""".getBytes("UTF-8"),
      """{"transaction_id":"k2","features":{"f1":2.0}}""".getBytes("UTF-8"),
      "not json at all".getBytes("UTF-8")) // malformed: must not kill the stream
    val stream = StreamOps.kafkaQueueDecode(input.toDF().toDF("value"))
      .filter(col("transaction_id").isNotNull) // drop the malformed record
    val q = ScoringStream.attach(stream, store, tmp("graft-kafka-ckpt"),
      Seq("f0", "f1"), Seq(1.0, -1.0), Seq(0.0, 0.0), 0.0)
    try {
      q.processAllAvailable()
      input.addData("""{"transaction_id":"k3","features":{"f0":5.0}}""".getBytes("UTF-8"))
      q.processAllAvailable()
      val snap = store.snapshot(spark)
      assert(snap.select("transaction_id").as[String].collect().toSet === Set("k1", "k2", "k3"))
      assert(snap.filter(col("status") === "COMPLETED").count() === 3)
    } finally q.stop()
  }

  test("in-stream Gopher gate admits exactly the docs the batch q127 filter keeps") {
    implicit val sqlCtx = spark.sqlContext
    // a passing doc needs >= 50 words, sane lengths, stop words, alpha text
    val good = (("the quick brown fox and the lazy dog that have been with us " * 5) +
      "of course this text is perfectly ordinary prose").trim
    val tooShort = "the of and short"
    val symbols = Seq.fill(60)("#tag").mkString(" ")
    val bullets = (1 to 10).map(i => s"- item $i the of and that").mkString("\n")

    val input = MemoryStream[(Long, String)]
    val gated = StreamOps.gopherGate(input.toDF().toDF("doc_id", "text"))
    val q = gated.writeStream.format("memory").queryName("gopher_gate").start()
    try {
      input.addData((1L, good), (2L, tooShort), (3L, symbols), (4L, bullets))
      q.processAllAvailable()
      val admitted = spark.table("gopher_gate")
        .select("doc_id").as[Long].collect().toSet
      assert(admitted === Set(1L))
      // batch/stream parity: the same frame filtered in batch admits the
      // same doc ids (ONE rule definition, not a drifting copy)
      val batch = Seq((1L, good), (2L, tooShort), (3L, symbols), (4L, bullets))
        .toDF("doc_id", "text")
      val batchKept = graft.llm.TextOps.gopherRules(batch, "text")
        .filter($"gopher_pass" === 1).select("doc_id").as[Long].collect().toSet
      assert(batchKept === admitted)
    } finally q.stop()
  }

  test("full document gate (quality AND repetition) admits exactly the batch-kept docs") {
    implicit val sqlCtx = spark.sqlContext
    // passes BOTH batteries: >=50 words, sane stats, no repeated phrases
    val clean = "the quick brown fox jumps over the lazy dog while seven curious " +
      "students read ancient maps beside a quiet river and two old sailors mend " +
      "green nets under pale morning light before the village market opens with " +
      "fresh bread ripe fruit warm tea and that have been plenty for everyone today"
    // passes A1.1 quality (100 words, stops, alpha) but fails A1.2: one
    // phrase repeated 25x dominates the 2-gram character mass
    val loop = Seq.fill(25)("the of jump stone").mkString(" ")
    // fails A1.1 (too short) but passes A1.2 vacuously (no 2-grams —
    // any multi-word short doc would trip the top-gram coverage rule,
    // whose count-1 numerator already dominates a tiny denominator)
    val short = "short"

    val input = MemoryStream[(Long, String)]
    val gated = StreamOps.documentGate(input.toDF().toDF("doc_id", "text"))
    val q = gated.writeStream.format("memory").queryName("doc_gate").start()
    try {
      input.addData((1L, clean), (2L, loop), (3L, short))
      q.processAllAvailable()
      val admitted = spark.table("doc_gate").select("doc_id").as[Long].collect().toSet
      assert(admitted === Set(1L))
      // the repetition-only gate admits the short doc too (vacuous pass)
      val repOnly = StreamOps.repetitionGate(
        Seq((1L, clean), (2L, loop), (3L, short)).toDF("doc_id", "text"))
        .select("doc_id").as[Long].collect().toSet
      assert(repOnly === Set(1L, 3L))
      // stream/batch parity on the composed gate: one rule definition
      val batch = Seq((1L, clean), (2L, loop), (3L, short)).toDF("doc_id", "text")
      val batchKept = graft.llm.TextOps.repetitionRules(
          graft.llm.TextOps.gopherRules(batch, "text"), "text")
        .filter($"gopher_pass" === 1 && $"rep_pass" === 1)
        .select("doc_id").as[Long].collect().toSet
      assert(batchKept === admitted)
    } finally q.stop()
  }

  test("in-stream contamination gate quarantines docs hitting the eval index") {
    implicit val sqlCtx = spark.sqlContext
    // static eval index: rare-shingle hashes 100-104
    val evalShingles = Seq(100L, 101L, 102L, 103L, 104L).toDF("h")
    val input = MemoryStream[(Timestamp, Long, Seq[Long])]
    val stream = input.toDF().toDF("ts", "doc_id", "shingle_hashes")
    val q = StreamOps.contaminationGate(stream, evalShingles, minShared = 3, "10 minutes")
      .writeStream.format("memory").queryName("contam_test").outputMode("update").start()
    try {
      input.addData(
        (ts(1), 1L, Seq(100L, 101L, 102L, 7L)),   // 3 hits -> quarantined
        (ts(2), 2L, Seq(100L, 5L, 6L)),           // 1 hit  -> clean
        (ts(3), 3L, Seq(100L, 101L, 102L, 103L))) // 4 hits -> quarantined
      q.processAllAvailable()
      val flagged = spark.table("contam_test").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flagged.keySet === Set(1L, 3L))
      assert(flagged(1L) === 3L && flagged(3L) === 4L)
      // eviction proof: advance the watermark far past the docs' windows
      // and the aggregation state must shrink back (the window in the
      // grouping key is what makes old doc state collectable)
      input.addData((ts(59), 99L, Seq(100L, 101L, 102L)))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 100L, Seq(1L)))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2,
        s"aggregation state not evicted by the watermark: $stateRows rows")
    } finally q.stop()
  }

  test("embedding near-dup gate flags same-direction arrivals, passes orthogonal ones") {
    implicit val sqlCtx = spark.sqlContext
    def oneHot(d: Int, scale: Double) = Seq.tabulate(64)(i => if (i == d) scale else 0.0)
    val index = Seq((10L, oneHot(0, 2.0)), (11L, oneHot(1, 1.0)), (12L, oneHot(2, 3.0)))
      .toDF("vec_id", "emb")
    val input = MemoryStream[(Timestamp, Long, Seq[Double])]
    val stream = input.toDF().toDF("ts", "doc_id", "emb")
    val q = StreamOps.embeddingDupGate(stream, index, bits = 4,
      threshold = 0.9, lateness = "10 minutes")
      .writeStream.format("memory").queryName("embgate_test").outputMode("update").start()
    try {
      input.addData(
        (ts(1), 1L, oneHot(0, 5.0)),   // same direction as vec 10 -> cos 1 -> flagged
        (ts(2), 2L, oneHot(7, 1.0)),   // orthogonal to the whole index -> clean
        (ts(3), 3L, oneHot(1, 1.0).updated(5, 0.01))) // vec 11 + tiny noise -> flagged
      q.processAllAvailable()
      val flagged = spark.table("embgate_test").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(flagged.keySet === Set(1L, 3L), s"gate flagged $flagged")
      assert(flagged(1L) === 1.0)
      assert(flagged(3L) > 0.99)
    } finally q.stop()
  }

  test("embedding dup gate runs against a PERSISTED index artifact (save → load → gate)") {
    implicit val sqlCtx = spark.sqlContext
    def oneHot(d: Int, scale: Double) = Seq.tabulate(64)(i => if (i == d) scale else 0.0)
    val index = Seq((10L, oneHot(0, 2.0)), (11L, oneHot(1, 1.0)), (12L, oneHot(2, 3.0)))
      .toDF("vec_id", "emb")
    val dir = tmp("graft-gateidx")
    StreamOps.saveDupGateIndex(index, bits = 4, dir)
    val (banded, bits) = StreamOps.loadDupGateIndex(spark, dir)
    assert(bits === 4, "band-key width did not travel with the artifact")
    val input = MemoryStream[(Timestamp, Long, Seq[Double])]
    val stream = input.toDF().toDF("ts", "doc_id", "emb")
    val q = StreamOps.embeddingDupGateBanded(stream, banded, bits,
      threshold = 0.9, lateness = "10 minutes")
      .writeStream.format("memory").queryName("embgate_load_test").outputMode("update").start()
    try {
      input.addData(
        (ts(1), 1L, oneHot(0, 5.0)),              // near-dup of vec 10 → flagged
        (ts(2), 2L, oneHot(7, 1.0)),              // orthogonal → clean
        (ts(3), 3L, Seq.fill(64)(0.0)))           // zero vector → NaN cosine → clean
      q.processAllAvailable()
      val flagged = spark.table("embgate_load_test").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(flagged.keySet === Set(1L), s"loaded-index gate flagged $flagged")
      assert(flagged(1L) === 1.0)
    } finally {
      q.stop()
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("in-stream dedup by content fingerprint emits each key once (ST3 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val stream = input.toDF().toDF("ts", "doc_id", "fingerprint")
    val q = StreamOps.streamingDedup(stream, "fingerprint", "10 minutes")
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      input.addData((ts(1), 1L, "fpA"), (ts(2), 2L, "fpB"), (ts(3), 3L, "fpA"))
      q.processAllAvailable()
      input.addData((ts(4), 4L, "fpA"), (ts(5), 5L, "fpC"))
      q.processAllAvailable()
      val out = spark.table("dedup_test").select("fingerprint").as[String].collect()
      assert(out.sorted.toSeq === Seq("fpA", "fpB", "fpC"),
        s"stream emitted ${out.mkString(",")}")
    } finally q.stop()
  }

  test("mapGroupsWithState tracks attempts to terminal COMPLETED/FAILED (ST4/ST5)") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.Attempt
    val input = MemoryStream[Attempt]
    val q = StreamOps.statefulAttempts(input.toDS(), maxAttempts = 3)
      .toDF("transaction_id", "attempts", "status")
      .writeStream.format("memory").queryName("attempts_test").outputMode("update").start()
    try {
      input.addData(Attempt("t1", false), Attempt("t2", true))
      q.processAllAvailable()
      input.addData(Attempt("t1", false))
      q.processAllAvailable()
      input.addData(Attempt("t1", false)) // third failure -> terminal FAILED
      q.processAllAvailable()
      input.addData(Attempt("t1", true)) // late success must NOT resurrect
      q.processAllAvailable()
      // latest state per key = the row with the highest attempt count
      val fin = spark.table("attempts_test")
        .groupBy("transaction_id")
        .agg(max(struct(col("attempts"), col("status"))).as("s"))
        .select(col("transaction_id"), col("s.attempts"), col("s.status"))
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(fin("t2") === ((1, "COMPLETED")))
      assert(fin("t1") === ((3, "FAILED")))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to prior clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val purchases = MemoryStream[(Long, Timestamp, String, Double)]
    val joined = StreamOps.clickAttribution(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      purchases.toDF().toDF("user_id", "ts", "purchase_id", "value"),
      attributionWindow = "30 minutes", lateness = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), "c1"), (2L, ts(5), "c2"))
      purchases.addData((1L, ts(10), "p1", 99.0)) // within 30m of c1
      purchases.addData((2L, ts(50), "p2", 5.0))  // beyond 30m of c2 -> no match
      q.processAllAvailable()
      val rows = spark.table("attr_test")
        .select("click_id", "purchase_id", "value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      assert(rows.toSeq === Seq(("c1", "p1", 99.0)), rows.mkString(","))
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.UserEvent
    val input = MemoryStream[UserEvent]
    val q = StreamOps.flatMapSessions(input.toDS(), gapMs = 5000)
      .writeStream.format("memory").queryName("fmgws_test").outputMode("append").start()
    try {
      // user 1: burst of 3 (2s apart), then a far later event closes it
      // inline (base offset keeps events clear of the initial watermark)
      val base = 100000L
      input.addData(UserEvent(1L, base), UserEvent(1L, base + 2000L), UserEvent(1L, base + 4000L))
      q.processAllAvailable()
      input.addData(UserEvent(1L, base + 60000L)) // gap > 5s -> closes burst
      q.processAllAvailable()
      // push the watermark far ahead so the open session times out
      input.addData(UserEvent(9L, base + 500000L))
      q.processAllAvailable()
      input.addData(UserEvent(9L, base + 900000L))
      q.processAllAvailable()
      val sessions = spark.table("fmgws_test")
        .filter($"userId" === 1L).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).sortBy(_._1)
      assert(sessions.nonEmpty, "no session closed for user 1")
      assert(sessions.head === ((base, base + 4000L, 3)), s"got ${sessions.mkString(",")}")
      // the +60s singleton must also have been closed by the timeout
      assert(sessions.length === 2)
      assert(sessions(1) === ((base + 60000L, base + 60000L, 1)))
    } finally q.stop()
  }

  test("sampleBy draws a seeded approximate stratified sample (W6 scale path)") {
    val df = graft.Tables.lineitem(spark, sfDir)
      .withColumn("label", (col("l_quantity") > 25).cast("int"))
    val sampled = df.stat.sampleBy("label", Map(0 -> 0.2, 1 -> 0.5), 42L)
    val base = df.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(got(0).toDouble / base(0) - 0.2) < 0.05)
    assert(math.abs(got(1).toDouble / base(1) - 0.5) < 0.05)
    // seeded: same sample on re-run
    val again = df.stat.sampleBy("label", Map(0 -> 0.2, 1 -> 0.5), 42L).count()
    assert(again === sampled.count())
  }

  test("IVF ingest stream: arrivals append to the persisted index, a fresh load serves them, replay is idempotent") {
    import graft.llm.{IvfSearch, ProductQuant}
    // 64 base vectors in 4 well-separated directions + per-vector jitter
    val base = (0 until 64).map { i =>
      val c = i % 4
      (i.toLong, Seq.tabulate(8)(d =>
        (if (d == c * 2) 1.0 else 0.0) + 0.01 * ((i * 7 + d) % 5)))
    }.toDF("vec_id", "emb")
    val index = IvfSearch.build(base, "vec_id", "emb", k = 4)
    val pq = ProductQuant.fit(base, "emb", m = 4, k = 4)
    val dir = tmp("graft-ivf-ingest")
    val ckpt = tmp("graft-ivf-ingest-ckpt")
    try {
      IvfSearch.save(index, dir)
      implicit val sqlCtx = spark.sqlContext
      // arrivals live in direction d=1 — orthogonal to every base
      // cluster direction (d = 0,2,4,6), so they are the strict
      // nearest neighbors of a d=1 probe under BOTH exact cosine and
      // quantized ADC distance (quantization collapses jitter-scale
      // differences, so a same-direction fixture would tie with base
      // rows and lose the id tie-break)
      def newVec(id: Long) =
        (id, Seq.tabulate(8)(d => if (d == 1) 1.0 else 0.001 * (id % 7)))
      val input = MemoryStream[(Long, Seq[Double])]
      val arrivals = input.toDF().toDF("vec_id", "emb")
      val q = StreamOps.ivfIngestSink(arrivals, dir, ckpt, pq = Some(pq))
      try {
        input.addData(newVec(1000L))
        q.processAllAvailable()
        input.addData(newVec(1001L), newVec(1002L))
        q.processAllAvailable()
      } finally q.stop()
      // a FRESH load (no handle on the stream's session state) serves
      // base + arrivals
      val servable = IvfSearch.loadServable(spark, dir)
      assert(servable.indexed.count() === 67L)
      // plain IVF search over the fresh load finds the new vectors
      val probe = Seq((9000L, Seq.tabulate(8)(d => if (d == 1) 1.0 else 0.0)))
        .toDF("vec_id", "emb")
      val hits = IvfSearch.search(servable, probe, "vec_id", "emb",
        nProbe = 2, topK = 5)
        .select("neighbor_id").as[Long].collect().toSet
      assert(Set(1000L, 1001L, 1002L).subsetOf(hits),
        s"ingested vectors missing from IVF search: $hits")
      // the composed ADC tier sees them too: the stream encoded codes
      // against the loaded codebooks, so base coded ∪ ingest tier is
      // the full servable coded corpus
      val baseCoded = ProductQuant.encode(index.indexed, "emb", pq)
        .select(col("vec_id"), col("cluster"), col("codes"))
      val ingest = IvfSearch.loadIngest(spark, dir).get
      assert(ingest.count() === 3L)
      val coded = baseCoded.unionByName(
        ingest.select(col("vec_id"), col("cluster"), col("codes")))
      val adcHits = ProductQuant.ivfAdcSearch(servable, coded, "vec_id", "codes",
        probe, "vec_id", "emb", pq, nProbe = 2, topK = 5)
        .select("neighbor_id").as[Long].collect().toSet
      assert(Set(1000L, 1001L, 1002L).subsetOf(adcHits),
        s"ingested vectors missing from ADC search: $adcHits")
      // replay safety: re-writing batch 1 with the same content (the
      // crash-recovery path foreachBatch takes) overwrites, not appends
      val batch1 = Seq(newVec(1001L), newVec(1002L)).toDF("vec_id", "emb")
      StreamOps.ivfIngestBatch(batch1, 1L, dir, servable.centers,
        servable.listBuckets.get, "emb", Some(pq))
      assert(IvfSearch.loadIngest(spark, dir).get.count() === 3L,
        "replayed micro-batch duplicated ingest rows")
      assert(IvfSearch.loadServable(spark, dir).indexed.count() === 67L)
    } finally {
      index.indexed.unpersist()
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("IVF ingest with residual codes lands arrivals in the base corpus's code space") {
    import graft.llm.{IvfSearch, ProductQuant}
    val base = (0 until 64).map { i =>
      val c = i % 4
      (i.toLong, Seq.tabulate(8)(d =>
        (if (d == c * 2) 1.0 else 0.0) + 0.01 * ((i * 7 + d) % 5)))
    }.toDF("vec_id", "emb")
    val index = IvfSearch.build(base, "vec_id", "emb", k = 4)
    val rpq = ProductQuant.fitResidual(index, "emb", m = 4, k = 4)
    val dir = tmp("graft-ivf-ingest-res")
    try {
      IvfSearch.save(index, dir)
      val loaded = IvfSearch.load(spark, dir)
      val arrivals = (2000 until 2003).map(id =>
        (id.toLong, Seq.tabulate(8)(d => if (d == 1) 1.0 else 0.001 * (id % 7))))
        .toDF("vec_id", "emb")
      StreamOps.ivfIngestBatch(arrivals, 0L, dir, loaded.centers,
        loaded.listBuckets.get, "emb", Some(rpq), residual = true)
      val got = IvfSearch.loadIngest(spark, dir).get
        .select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      // the ingest tier's codes must be exactly what a batch
      // encodeResidual of the same arrivals against the same artifacts
      // produces — same space as the base corpus, deterministic
      val expected = ProductQuant.encodeResidual(
        IvfSearch.assign(arrivals, "emb", loaded.centers), "emb",
        loaded.centers, rpq)
        .select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      assert(got.length === 3 && got.sameElements(expected),
        "ingested residual codes diverged from batch encodeResidual")
    } finally {
      index.indexed.unpersist()
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("IVF ingest into an OPQ-rotated index rotates arrivals into the index's space") {
    import graft.llm.{IvfSearch, Opq, ProductQuant}
    // correlated corpus (second half copies the first) — the case OPQ
    // learns a non-trivial rotation for
    val base = (0 until 64).map { i =>
      val c = i % 4
      val half = Seq.tabulate(4)(d => (if (d == c) 2.0 else 0.0) + 0.01 * ((i * 7 + d) % 5))
      (i.toLong, half ++ half.map(_ * 1.5))
    }.toDF("vec_id", "emb")
    val opq = Opq.fit(base, "emb", m = 4, k = 4, opqIters = 4, maxIter = 8)
    // index built IN the rotated space — the Opq serving layout
    val rotatedBase = Opq.rotate(base, "emb", opq, "emb")
    val index = IvfSearch.build(rotatedBase, "vec_id", "emb", k = 4)
    val dir = tmp("graft-ivf-ingest-opq")
    val opqDir = tmp("graft-ivf-ingest-opq-model")
    val ckpt = tmp("graft-ivf-ingest-opq-ckpt")
    try {
      IvfSearch.save(index, dir)
      Opq.save(spark, opq, opqDir)
      implicit val sqlCtx = spark.sqlContext
      // arrivals arrive RAW — the sink owns the rotation
      def newVec(id: Long) = (id, Seq.tabulate(8)(d => if (d == 1) 1.5 else 0.001 * (id % 7)))
      val input = MemoryStream[(Long, Seq[Double])]
      val arrivals = input.toDF().toDF("vec_id", "emb")
      val q = StreamOps.ivfIngestSink(arrivals, dir, ckpt,
        pq = Some(opq.pq), opqDir = Some(opqDir))
      try {
        input.addData(newVec(3000L), newVec(3001L))
        q.processAllAvailable()
      } finally q.stop()
      // the stored arrival embedding is the ROTATED vector (in-space
      // storage: same column contract as the base corpus), with codes
      // equal to a batch encode of the rotated arrival
      val raw = Seq(newVec(3000L), newVec(3001L)).toDF("vec_id", "emb")
      val expected = ProductQuant.encode(
        Opq.rotate(raw, "emb", opq, "emb"), "emb", opq.pq)
        .select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      val got = IvfSearch.loadIngest(spark, dir).get
        .select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      assert(got.length === 2 && got.sameElements(expected),
        "rotated-ingest codes diverged from batch rotate+encode")
      // a correctly-rotated probe finds the arrivals from a fresh load
      val servable = IvfSearch.loadServable(spark, dir)
      val probe = Opq.rotate(
        Seq((9000L, Seq.tabulate(8)(d => if (d == 1) 1.5 else 0.0)))
          .toDF("vec_id", "emb"), "emb", opq, "emb")
      val hits = IvfSearch.search(servable, probe, "vec_id", "emb",
        nProbe = 2, topK = 3)
        .select("neighbor_id").as[Long].collect().toSet
      assert(Set(3000L, 3001L).subsetOf(hits),
        s"rotated arrivals unreachable by rotated probes: $hits")
    } finally {
      index.indexed.unpersist()
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(opqDir))
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("self-growing dup gate: admitted docs join the index and reject their later duplicates") {
    import spark.implicits._
    def oneHot(d: Int, scale: Double) = Seq.tabulate(64)(i => if (i == d) scale else 0.0)
    val index = Seq((10L, oneHot(0, 2.0)), (11L, oneHot(2, 1.0)))
      .toDF("vec_id", "emb")
    val dir = tmp("graft-gategrow")
    StreamOps.saveDupGateIndex(index, bits = 4, dir)
    try {
      def gateSize = StreamOps.loadDupGateIndex(spark, dir)._1
        .select("vec_id").distinct().count()
      assert(gateSize === 2L)
      // batch 0: A fresh; B = same-direction dup of A (first-wins: A
      // admitted, B rejected); C duplicates base vec 10 → rejected
      val b0 = Seq(
        (100L, oneHot(1, 5.0)), (101L, oneHot(1, 3.0)), (102L, oneHot(0, 7.0)))
        .toDF("vec_id", "emb")
      StreamOps.dupGateIngestBatch(b0, 0L, dir, bits = 4, threshold = 0.9)
      assert(gateSize === 3L, "batch 0 should admit exactly doc 100")
      // batch 1: D duplicates the JUST-ADMITTED 100 → rejected (the
      // self-growing property a static index lacks); E is fresh
      val b1 = Seq((103L, oneHot(1, 2.0)), (104L, oneHot(3, 1.0)))
        .toDF("vec_id", "emb")
      StreamOps.dupGateIngestBatch(b1, 1L, dir, bits = 4, threshold = 0.9)
      assert(gateSize === 4L, "batch 1 should admit exactly doc 104")
      // replay of batch 1 recomputes identical content (its own crashed
      // dir is excluded from the index view, so nothing self-matches)
      StreamOps.dupGateIngestBatch(b1, 1L, dir, bits = 4, threshold = 0.9)
      assert(gateSize === 4L, "replayed batch duplicated or dropped rows")
      // compaction folds both batches into banded_v2; the gate view is
      // unchanged and a folded batch's replay is refused
      assert(StreamOps.compactDupGateIndex(spark, dir))
      assert(new java.io.File(s"$dir/banded_v2").isDirectory)
      assert(graft.sources.TieredParquet.loadIngest(spark, dir, "banded").isEmpty)
      assert(gateSize === 4L, "compaction changed the gate view")
      StreamOps.dupGateIngestBatch(b1, 1L, dir, bits = 4, threshold = 0.9)
      assert(graft.sources.TieredParquet.loadIngest(spark, dir, "banded").isEmpty,
        "replay of a folded batch resurrected its directory")
      // post-compaction arrivals still dedup against folded admissions
      val b2 = Seq((105L, oneHot(3, 9.0)), (106L, oneHot(5, 1.0)))
        .toDF("vec_id", "emb")
      StreamOps.dupGateIngestBatch(b2, 2L, dir, bits = 4, threshold = 0.9)
      assert(gateSize === 5L, "batch 2 should reject the dup of folded doc 104")
      val ids = StreamOps.loadDupGateIndex(spark, dir)._1
        .select("vec_id").distinct().as[Long].collect().toSet
      assert(ids === Set(10L, 11L, 100L, 104L, 106L))
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("dup-gate takedown: a deleted doc stops gating, its re-submission is admitted") {
    import spark.implicits._
    def oneHot(d: Int, scale: Double) = Seq.tabulate(64)(i => if (i == d) scale else 0.0)
    val index = Seq((10L, oneHot(0, 2.0)), (11L, oneHot(2, 1.0)))
      .toDF("vec_id", "emb")
    val dir = tmp("graft-gatedel")
    StreamOps.saveDupGateIndex(index, bits = 4, dir)
    try {
      def gateIds = StreamOps.loadDupGateIndex(spark, dir)._1
        .select("vec_id").distinct().as[Long].collect().toSet
      // a copy of base doc 10 is rejected while 10 is in the gate
      val dup = Seq((200L, oneHot(0, 5.0))).toDF("vec_id", "emb")
      StreamOps.dupGateIngestBatch(dup, 0L, dir, bits = 4, threshold = 0.9)
      assert(gateIds === Set(10L, 11L), "duplicate of a gated doc was admitted")
      // takedown of 10: it stops gating IMMEDIATELY (logical delete)
      StreamOps.dupGateDelete(spark, dir, Seq(10L).toDF("vec_id"), "takedown-10")
      assert(gateIds === Set(11L))
      // the re-submission is a new editorial decision, not a duplicate
      // of removed content — admitted now
      val resub = Seq((201L, oneHot(0, 5.0))).toDF("vec_id", "emb")
      StreamOps.dupGateIngestBatch(resub, 1L, dir, bits = 4, threshold = 0.9)
      assert(gateIds === Set(11L, 201L), "re-submission after takedown was rejected")
      // the fold makes the erasure physical and cleans the tombstone dir
      assert(StreamOps.compactDupGateIndex(spark, dir))
      assert(gateIds === Set(11L, 201L))
      assert(!new java.io.File(s"$dir/deletes/del=takedown-10").exists())
      // wrong-shaped tombstones refused
      assert(intercept[IllegalArgumentException](
        StreamOps.dupGateDelete(spark, dir, Seq((1L, 2L)).toDF("a", "b"), "bad"))
        .getMessage.contains("exactly (vec_id)"))
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("self-growing TEXT dup gate: lifecycle admit/reject/replay/compact/takedown") {
    import spark.implicits._
    val theta = 0.5 // planBands(16, 0.5) → 8 bands × 2 rows
    val index = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-textgate")
    StreamOps.saveTextDupGateIndex(index, theta, dir)
    try {
      val (_, bands, th) = StreamOps.loadTextDupGateIndex(spark, dir)
      assert(bands === 8 && th === 0.5)
      def gateIds = StreamOps.loadTextDupGateIndex(spark, dir)._1
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(gateIds === Set(10L, 11L))
      // batch 0: 100 fresh; 101 near-copy of 100 (J=4/6 ≥ θ, first-wins
      // rejects the higher id); 102 exact copy of base doc 10 (J=1)
      val b0 = Seq(
        (100L, "red green blue yellow purple orange"),
        (101L, "red green blue yellow purple pink"),
        (102L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")
      StreamOps.textDupGateIngestBatch(b0, 0L, dir, bands, theta)
      assert(gateIds === Set(10L, 11L, 100L), "batch 0 should admit exactly doc 100")
      // batch 1: 103 near-dups the JUST-ADMITTED 100 → rejected
      // (self-growing); 104 fresh
      val b1 = Seq(
        (103L, "red green blue yellow purple orange extra"),
        (104L, "seven eight nine ten eleven twelve"))
        .toDF("doc_id", "text")
      StreamOps.textDupGateIngestBatch(b1, 1L, dir, bands, theta)
      assert(gateIds === Set(10L, 11L, 100L, 104L))
      // replay recomputes identical content
      StreamOps.textDupGateIngestBatch(b1, 1L, dir, bands, theta)
      assert(gateIds === Set(10L, 11L, 100L, 104L))
      // compaction folds; folded replay refused; gate view unchanged
      assert(StreamOps.compactTextDupGateIndex(spark, dir))
      assert(graft.sources.TieredParquet.loadIngest(spark, dir, "banded").isEmpty)
      StreamOps.textDupGateIngestBatch(b1, 1L, dir, bands, theta)
      assert(graft.sources.TieredParquet.loadIngest(spark, dir, "banded").isEmpty,
        "replay of a folded batch resurrected its directory")
      assert(gateIds === Set(10L, 11L, 100L, 104L))
      // takedown of 10: its re-submission is a fresh decision
      StreamOps.textDupGateDelete(spark, dir, Seq(10L).toDF("doc_id"), "takedown-10")
      assert(gateIds === Set(11L, 100L, 104L))
      val resub = Seq((200L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")
      StreamOps.textDupGateIngestBatch(resub, 2L, dir, bands, theta)
      assert(gateIds === Set(11L, 100L, 104L, 200L),
        "re-submission after takedown was rejected")
      // wrong-shaped tombstones refused
      assert(intercept[IllegalArgumentException](
        StreamOps.textDupGateDelete(spark, dir, Seq((1L, 2L)).toDF("a", "b"), "bad"))
        .getMessage.contains("exactly (doc_id)"))
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("TEXT dup gate: degenerate docs are admitted, never candidates") {
    import spark.implicits._
    val dir = tmp("graft-textgate-deg")
    StreamOps.saveTextDupGateIndex(
      Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text"), 0.5, dir)
    try {
      // one-token and empty docs have no shingles → no band keys → both
      // admitted (they cannot near-dup by a shingle detector), and two
      // identical degenerate docs do NOT collide into a null bucket
      val b0 = Seq((300L, "solo"), (301L, "solo"), (302L, ""))
        .toDF("doc_id", "text")
      StreamOps.textDupGateIngestBatch(b0, 0L, dir, 8, 0.5)
      val banded = StreamOps.loadTextDupGateIndex(spark, dir)._1
      // admitted but bandless docs write no band rows — the gate index
      // only ever carries docs that can actually gate
      assert(banded.select("doc_id").distinct().as[Long].collect().toSet === Set(10L))
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("streaming TEXT near-dup monitor flags near-copies with exact jaccard") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmp("graft-textgate-mon")
    StreamOps.saveTextDupGateIndex(Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six"))
      .toDF("doc_id", "text"), 0.5, dir)
    try {
      val (banded, bands, theta) = StreamOps.loadTextDupGateIndex(spark, dir)
      val cached = banded.cache()
      val input = MemoryStream[(Timestamp, Long, String)]
      val docs = input.toDF().toDF("ts", "doc_id", "text")
      val q = StreamOps.textDupGateBanded(docs, cached, bands, theta, "10 minutes")
        .writeStream.format("memory").queryName("textgate_mon")
        .outputMode("update").start()
      try {
        input.addData(
          (ts(1), 1L, "alpha beta gamma delta epsilon zeta"), // exact copy, J=1
          (ts(2), 2L, "totally different words here entirely"),
          (ts(3), 3L, "solo")) // degenerate: no bands, never flagged
        q.processAllAvailable()
        val flagged = spark.table("textgate_mon")
          .select("doc_id", "max_jaccard").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(flagged.keySet === Set(1L), s"monitor flagged $flagged")
        assert(flagged(1L) === 1.0)
      } finally q.stop()
    } finally {
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("streaming PSI drift: a shifted window alarms, a matching window stays quiet") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def doc(words: Int) = Seq.fill(words)("w").mkString(" ")
    // reference: 10 docs in each of bins 0..3 (word counts 8/24/40/56)
    val ref = (0 until 4).flatMap(b => Seq.fill(10)(doc(8 + 16 * b))).toDF("text")
    val dir = tmp("graft-psiref")
    StreamOps.savePsiReference(ref, dir)
    try {
      val input = MemoryStream[(Timestamp, String)]
      val docs = input.toDF().toDF("ts", "text")
      val q = StreamOps.psiDriftMonitor(docs, dir, "10 minutes", "10 minutes")
        .writeStream.format("memory").queryName("psi_mon")
        .outputMode("update").start()
      try {
        // window 1 (10:00): the reference mix — 2 docs per bin 0..3
        input.addData((0 until 4).flatMap(b =>
          Seq((ts(1), doc(8 + 16 * b)), (ts(2), doc(8 + 16 * b)))): _*)
        // window 2 (10:20): all mass in the top bin — drifted
        input.addData(Seq.fill(8)((ts(21), doc(200))): _*)
        q.processAllAvailable()
        val psi = spark.table("psi_mon")
          .select("win_start", "psi_micro").collect()
          .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
        assert(psi.size === 2, s"expected two windows, got $psi")
        val Seq(quiet, drifted) = psi.toSeq.sortBy(_._1.getTime).map(_._2)
        assert(quiet >= 0L && drifted >= 0L, "PSI terms must be non-negative")
        assert(drifted > 4 * quiet && drifted > 1000000L,
          s"drifted window PSI $drifted should dwarf the matching window's $quiet")
      } finally q.stop()
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("dq monitor: per-window constraint metrics match the hand-computed batch battery") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(Timestamp, String, Double)]
    val rows = input.toDF().toDF("ts", "event_type", "value")
    val checks = Seq(
      "value_nonneg" -> (col("value") >= 0.0),
      "known_type" -> col("event_type").isin("view", "purchase"),
      "value_under_100" -> (col("value") < 100.0))
    val q = StreamOps.dqMonitor(rows, checks, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("dq_mon")
      .outputMode("update").start()
    try {
      // window 10:00: exactly one violating row per check
      input.addData((ts(1), "view", 5.0), (ts(2), "purchase", 150.0), (ts(3), "weird", -1.0))
      // window 10:20: fully clean
      input.addData((ts(21), "view", 1.0), (ts(22), "view", 2.0))
      q.processAllAvailable()
      val out = spark.table("dq_mon").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(out.size === 6, s"expected 2 windows x 3 checks, got ${out.keySet}")
      val (w1, w2) = (ts(0), ts(20))
      for (c <- checks.map(_._1)) {
        assert(out((w1, c)) === ((3L, 2L, 0.6667)), s"dirty window, $c: ${out((w1, c))}")
        assert(out((w2, c)) === ((2L, 2L, 1.0)), s"clean window, $c: ${out((w2, c))}")
      }
    } finally q.stop()
  }

  test("keyed EWMA state: stream fold equals the batch recurrence; late days are refused") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamOps.DailySpend]
    val q = StreamOps.ewmaSpendState(input.toDS())
      .writeStream.format("memory").queryName("ewma_state")
      .outputMode("append").start()
    try {
      // trigger 1: user 7 gets days 2,1 OUT of order — the in-batch sort fixes it
      input.addData(StreamOps.DailySpend(7L, 2L, 50L), StreamOps.DailySpend(7L, 1L, 100L))
      q.processAllAvailable()
      // trigger 2: day 3 advances the fold; a re-sent day 2 must be dropped,
      // and user 8 starts fresh
      input.addData(StreamOps.DailySpend(7L, 3L, 25L),
        StreamOps.DailySpend(7L, 2L, 999L), StreamOps.DailySpend(8L, 1L, 40L))
      q.processAllAvailable()
      val out = spark.table("ewma_state").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      // batch recurrence over [100, 50, 25]: 100, (100+50)/2=75, (75+25)/2=50
      assert(out === Map((7L, 1L) -> 100L, (7L, 2L) -> 75L, (7L, 3L) -> 50L,
        (8L, 1L) -> 40L), s"stream fold diverged: $out")
    } finally q.stop()
  }

  test("keyed CUSUM state: stream closed form equals the batch recurrence; late days refused") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamOps.DailyRevenue]
    val q = StreamOps.cusumState(input.toDS(), Map("buy" -> ((10L, 10L))))
      .writeStream.format("memory").queryName("cusum_state")
      .outputMode("append").start()
    try {
      // trigger 1: days 2,1 arrive OUT of order — the in-batch sort fixes it
      input.addData(StreamOps.DailyRevenue("buy", 2L, 25L),
        StreamOps.DailyRevenue("buy", 1L, 5L))
      q.processAllAvailable()
      // trigger 2: day 3 advances the fold; a re-sent day 2 must be dropped
      input.addData(StreamOps.DailyRevenue("buy", 3L, 2L),
        StreamOps.DailyRevenue("buy", 2L, 999L))
      q.processAllAvailable()
      val out = spark.table("cusum_state").collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      // recurrence, target 10: S₁=max(0,5−10)=0; S₂=0+15=15 (alarm >10);
      // S₃=max(0,15−8)=7 — the stream's closed form must reproduce it
      assert(out === Map(1L -> ((0L, false)), 2L -> ((15L, true)), 3L -> ((7L, false))),
        s"stream CUSUM diverged: $out")
    } finally q.stop()
    // a series with no reference entry is refused, not defaulted
    val orphan = MemoryStream[StreamOps.DailyRevenue]
    val q2 = StreamOps.cusumState(orphan.toDS(), Map("buy" -> ((10L, 10L))))
      .writeStream.format("memory").queryName("cusum_orphan")
      .outputMode("append").start()
    try {
      orphan.addData(StreamOps.DailyRevenue("mystery", 1L, 5L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(chain.contains("no CUSUM reference"), s"wrong failure: $chain")
    } finally q2.stop()
  }

  test("keyed MG heavy-hitter state: theorems hold on every prefix across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamOps.TokenArrival]
    val q = StreamOps.heavyHittersState(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("mg_state")
      .outputMode("append").start()
    def parse(s: String): Map[String, Long] =
      if (s.isEmpty) Map.empty
      else s.split(',').map { kv => val Array(t, c) = kv.split(':'); t -> c.toLong }.toMap
    try {
      val t1 = Seq.fill(20)("hot") ++ Seq.fill(8)("warm") ++ Seq("a", "b", "c", "d")
      input.addData(t1.map(StreamOps.TokenArrival("web", _)): _*)
      q.processAllAvailable()
      val t2 = Seq.fill(15)("hot") ++ Seq("e", "f")
      input.addData(t2.map(StreamOps.TokenArrival("web", _)): _*)
      q.processAllAvailable()
      val snaps = spark.table("mg_state").collect()
        .map(r => r.getLong(1) -> parse(r.getString(2))).sortBy(_._1)
      assert(snaps.map(_._1).toSeq === Seq(t1.length.toLong, (t1.length + t2.length).toLong))
      // at every snapshot: the prefix's true heavies present, undercount bounded
      val prefixes = Seq(t1, t1 ++ t2)
      snaps.zip(prefixes).foreach { case ((n, est), prefix) =>
        val truth = prefix.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        val slack = n.toDouble / 4 // k + 1 = 4
        truth.foreach { case (t, f) =>
          if (f > slack) assert(est.contains(t), s"prefix n=$n: heavy '$t' evicted")
          val e = est.getOrElse(t, 0L)
          assert(e <= f && f - e <= slack, s"prefix n=$n: '$t' est $e vs true $f")
        }
        assert(est.size <= 3)
      }
    } finally q.stop()
  }

  test("keyed HLL distinct state: prefix-exact snapshots, replay-idempotent, equals the q211 batch engine") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the q211 dense scope's exact key set, streamed in three triggers
    // with the middle batch fully REPLAYED in the third — max-merge must
    // make the duplicates a no-op, and the final snapshot must equal the
    // batch engine's q211 row for the same scope (one rule, two tiers)
    val lineKeys = graft.Tables.lineitem(spark, sfDir)
      .select(concat(col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string")).as("k"))
      .collect().map(_.getString(0)).toSeq
    val (b1, rest) = lineKeys.splitAt(lineKeys.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 3)
    val input = MemoryStream[StreamOps.KeyArrival]
    val q = StreamOps.distinctSketchState(input.toDS())
      .writeStream.format("memory").queryName("hll_state")
      .outputMode("append").start()
    try {
      input.addData(b1.map(StreamOps.KeyArrival("line_ids", _)): _*)
      q.processAllAvailable()
      input.addData(b2.map(StreamOps.KeyArrival("line_ids", _)): _*)
      q.processAllAvailable()
      input.addData((b2 ++ b3).map(StreamOps.KeyArrival("line_ids", _)): _*)
      q.processAllAvailable()
      val snaps = spark.table("hll_state").as[StreamOps.HllSnapshot]
        .collect().sortBy(_.nSeen)
      assert(snaps.length === 3)
      // every trigger's snapshot is the exact sketch of the prefix
      val prefixes = Seq(b1, b1 ++ b2, b1 ++ b2 ++ b2 ++ b3)
      snaps.zip(prefixes).foreach { case (snap, prefix) =>
        val regs = prefix.foldLeft(graft.functions.Hll.zero)(graft.functions.Hll.add)
        val (used, sumRank, maxRank, d, est) = graft.functions.Hll.summary(regs)
        assert(snap.nSeen === prefix.size.toLong)
        assert((snap.regsUsed, snap.sumRank, snap.maxRank, snap.denom, snap.estMicro)
          === ((used, sumRank, maxRank, d, est)), s"prefix n=${prefix.size} sketch drifted")
      }
      // the replayed b2 changed nothing but nSeen: snapshots 2 and 3
      // differ only by b3's genuinely-new keys (b2's re-delivery is
      // absorbed by max-merge idempotence)
      val cleanFinal = (b1 ++ b2 ++ b3).foldLeft(graft.functions.Hll.zero)(graft.functions.Hll.add)
      val (u, sr, mr, d, est) = graft.functions.Hll.summary(cleanFinal)
      val last = snaps.last
      assert((last.regsUsed, last.sumRank, last.maxRank, last.denom, last.estMicro)
        === ((u, sr, mr, d, est)), "replay was not idempotent")
      // bridge to the batch tier: the q211 engine row for this scope
      val batch = graft.queries.ExtQueries.queries("q211_hll_cardinality")(spark, sfDir)
        .filter(col("scope") === "line_ids").collect().head
      assert(batch.getLong(2) === last.regsUsed, "batch regs_used != stream")
      assert(batch.getLong(3) === last.sumRank, "batch sum_rank != stream")
      assert(batch.getLong(4) === last.maxRank, "batch max_rank != stream")
      assert(batch.getLong(5) === last.denom, "batch denom != stream")
      assert(batch.getLong(6) === last.estMicro, "batch est_micro != stream")
    } finally q.stop()
  }

  test("bounded retry: transient failures recover, persistent ones give up (ST4)") {
    var calls = 0
    val (_, attempts) = StreamOps.withBoundedRetry(maxAttempts = 5) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(attempts === 3)
    val ex = intercept[RuntimeException] {
      StreamOps.withBoundedRetry(maxAttempts = 2) { () =>
        throw new RuntimeException("persistent")
      }
    }
    assert(ex.getMessage.contains("after 2 attempts"))
  }

  test("profileSink maintains the corpus profile across triggers without re-scan") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.{MergeProfile, TextOps}
    val dir = tmp("profile_sink")
    val input = MemoryStream[(String, String)]
    val q = StreamOps.profileSink(
      input.toDF().toDF("source", "text"), dir, tmp("profile_ck"), shards = 16L)
    try {
      input.addData(("web", "alpha beta gamma"), ("web", "alpha beta"), ("books", "x y"))
      q.processAllAvailable()
      input.addData(("web", "alpha beta gamma"), ("books", "p q r s")) // exact repeat arrives
      q.processAllAvailable()
    } finally q.stop()
    val merged = MergeProfile.loadProfile(spark, dir)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // direct profile over ALL five docs with the sink's own derivation
    val all = Seq(("web", "alpha beta gamma"), ("web", "alpha beta"), ("books", "x y"),
      ("web", "alpha beta gamma"), ("books", "p q r s"))
      .toDF("source", "text")
      .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        TextOps.rollingHash(col("text")).as("h"))
    val direct = MergeProfile.profile(all, 16L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(merged.toSeq === direct.toSeq)
    // the repeated web doc counts as a doc but NOT as a new distinct
    val web = merged.find(_._1 == "web").get
    assert(web._2 === 3L && web._3 === 2L)
  }

  test("budgetGate admits per-source prefix budgets across triggers, parity with batch") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.BudgetDoc
    val input = MemoryStream[BudgetDoc]
    val gated = StreamOps.budgetGate(input.toDS(), budgetPerSource = 100L)
    val q = gated.toDF("source", "doc_id", "n_tokens", "cum_tokens")
      .writeStream.format("memory").queryName("budget_test")
      .outputMode("append").start()
    try {
      input.addData(BudgetDoc("a", 1L, 40L), BudgetDoc("a", 2L, 40L),
        BudgetDoc("b", 10L, 90L))
      q.processAllAvailable()
      // a position: 80; b position: 90 — all three admitted
      input.addData(
        BudgetDoc("a", 3L, 30L),  // position 110 > 100 — rejected
        BudgetDoc("a", 4L, 15L),  // position 125 — ALSO rejected: prefix
                                  // semantics advance the position over
                                  // rejected docs (80+15 would fit, but
                                  // best-fit would make verdicts depend
                                  // on later arrivals)
        BudgetDoc("b", 11L, 10L)) // position exactly 100 — admitted
      q.processAllAvailable()
      val got = spark.table("budget_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(got === Set(("a", 1L, 40L), ("a", 2L, 80L), ("b", 10L, 90L), ("b", 11L, 100L)))

      // batch parity: the q130-style prefix-budget window over the same
      // docs in the same order admits exactly the same set
      val allDocs = Seq(("a", 1L, 40L), ("a", 2L, 40L), ("b", 10L, 90L),
        ("a", 3L, 30L), ("a", 4L, 15L), ("b", 11L, 10L))
        .toDF("source", "doc_id", "n_tokens")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val batchAdmitted = allDocs
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= 100L)
        .select("source", "doc_id", "cum_tokens")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(batchAdmitted === got, "stream admission diverged from the batch sampler")
    } finally q.stop()
  }
}

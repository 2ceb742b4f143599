package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val blobs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("resize emits target geometry with deterministic checksums") {
    val out = Multimodal.resize(blobs, "doc_id", "payload", targetW = 32, targetH = 24)
    assert(out.count() === blobs.count())
    assert(out.filter(col("width") =!= 32 || col("height") =!= 24).count() === 0)
    val a = out.agg(sum("pixel_checksum")).head().getLong(0)
    val b = Multimodal.resize(blobs.repartition(7), "doc_id", "payload", 32, 24)
      .agg(sum("pixel_checksum")).head().getLong(0)
    assert(a === b, "checksum not partition-invariant")
  }

  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("resize decodes a real PNG and derives output from actual pixels") {
    val df = Seq((1L, pngBytes(4, 4, 0xff0000))).toDF("doc_id", "payload")
    val out = Multimodal.resize(df, "doc_id", "payload", targetW = 2, targetH = 2).head()
    assert(out.getAs[Boolean]("decoded"))
    assert(out.getAs[Int]("src_width") === 4 && out.getAs[Int]("src_height") === 4)
    assert(out.getAs[Int]("width") === 2 && out.getAs[Int]("height") === 2)
    // 2x2 resample of solid red: four pixels of 0xff0000 through the
    // rolling checksum — computable by hand, so this pins REAL decode
    val expected = (0 until 4).foldLeft(0L)((a, _) => (a * 31 + 0xff0000L) % 1000000007L)
    assert(out.getAs[Long]("pixel_checksum") === expected)
  }

  test("resize decodes JPEG and distinguishes pixel content") {
    val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 6) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.resize(df, "doc_id", "payload", 4, 3).head()
    assert(out.getAs[Boolean]("decoded"))
    assert(out.getAs[Int]("src_width") === 8 && out.getAs[Int]("src_height") === 6)
    // different pixel content -> different checksum (decode is not a
    // function of the container bytes alone)
    val red = Multimodal.resize(
      Seq((1L, pngBytes(8, 6, 0xff0000))).toDF("doc_id", "payload"), "doc_id", "payload", 4, 3)
      .head().getAs[Long]("pixel_checksum")
    assert(out.getAs[Long]("pixel_checksum") !== red)
  }

  test("a declared-geometry decompression bomb bails to the fallback, no raster allocated") {
    // hand-built PNG header DECLARING 50000x50000 (2.5e9 px ≈ 10 GB
    // raster) with a valid IHDR CRC — the reader must report the
    // geometry from the header and the guard must refuse to decode
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(50000).putInt(50000)
    ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32(); crc.update(ihdr.array())
    val len = java.nio.ByteBuffer.allocate(4).putInt(13).array()
    bos.write(len); bos.write(ihdr.array())
    bos.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    val bomb = bos.toByteArray
    assert(Multimodal.decodeResize(bomb, 2, 2).isEmpty)
    val out = Multimodal.resize(Seq((1L, bomb)).toDF("doc_id", "payload"),
      "doc_id", "payload", 2, 2).head()
    assert(!out.getAs[Boolean]("decoded"))
  }

  test("non-image payloads fall back to the deterministic stub, flagged undecoded") {
    val bytes = "definitely not an image payload".getBytes("UTF-8")
    val out = Multimodal.resize(Seq((7L, bytes)).toDF("doc_id", "payload"),
      "doc_id", "payload", 32, 24).head()
    assert(!out.getAs[Boolean]("decoded"))
    assert(out.getAs[Int]("src_width") === -1 && out.getAs[Int]("src_height") === -1)
    assert(out.getAs[Long]("pixel_checksum") === Multimodal.stubChecksum(bytes, 32))
  }

  test("audioFrames decodes a real WAV with exact-integer energy features") {
    // 100 samples of a known ramp: sample(i) = 50*i - 2000
    val ns = 100
    val pcm = new Array[Byte](ns * 2)
    for (i <- 0 until ns) {
      val v = (50 * i - 2000).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((3L, bos.toByteArray)).toDF("clip_id", "payload")
    val out = Multimodal.audioFrames(df, "clip_id", "payload", frameSamples = 25, stride = 2).head()
    assert(out.getAs[Boolean]("decoded"))
    assert(out.getAs[Int]("sample_rate") === 16000)
    assert(out.getAs[Int]("n_samples") === ns && out.getAs[Int]("n_frames") === 4)
    val frames = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("frames"))
    assert(frames.map(_.getInt(0)) === Seq(0, 2)) // every 2nd of 4 frames
    def expSum(f: Int) = (f * 25 until (f + 1) * 25).map(i => math.abs(50 * i - 2000).toLong).sum
    assert(frames.map(_.getLong(1)) === Seq(expSum(0), expSum(2)))
  }

  test("non-WAV payloads come back decoded=false with empty frames") {
    val out = Multimodal.audioFrames(
      Seq((9L, "just text".getBytes("UTF-8"))).toDF("clip_id", "payload"),
      "clip_id", "payload", 25, 2).head()
    assert(!out.getAs[Boolean]("decoded"))
    assert(out.getAs[Int]("n_sampled") === 0)
  }

  private def jpegBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (((seed * 31 + x * 17 + y * 101) * 2654435761L) % 0x1000000L).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("videoFrames demuxes a synthetic 3-frame MJPEG AVI and decodes every frame") {
    val jpegs = (0 until 3).map(f => jpegBytes(16, 8, seed = f))
    val avi = Multimodal.encodeAviMjpeg(jpegs, w = 16, h = 8, fps = 10)
    // the demux must recover the EXACT muxed payload bytes, in order
    assert(Multimodal.aviFramePayloads(avi).get.map(_.toSeq) === jpegs.map(_.toSeq))
    val out = Multimodal.videoFrames(
      Seq((5L, avi)).toDF("video_id", "payload"), "video_id", "payload", stride = 1).head()
    assert(out.getAs[Boolean]("decoded"))
    assert(out.getAs[Int]("width") === 16 && out.getAs[Int]("height") === 8)
    assert(out.getAs[Int]("n_frames") === 3 && out.getAs[Int]("n_sampled") === 3)
    val frames = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("frames"))
    assert(frames.map(_.getInt(0)) === Seq(0, 1, 2))
    // per-frame checksums match an independent decode of the same bytes
    val exp = jpegs.map(b => Multimodal.pixelChecksum(Multimodal.decodeImage(b).get))
    assert(frames.map(_.getLong(1)) === exp)
    // stride sampling keeps frames 0 and 2
    val strided = Multimodal.videoFrames(
      Seq((5L, avi)).toDF("video_id", "payload"), "video_id", "payload", stride = 2).head()
    assert(strided.getSeq[org.apache.spark.sql.Row](strided.fieldIndex("frames"))
      .map(_.getInt(0)) === Seq(0, 2))
  }

  test("videoFrames flags non-AVI and truncated payloads instead of throwing") {
    val jpegs = (0 until 3).map(f => jpegBytes(8, 8, seed = f + 7))
    val avi = Multimodal.encodeAviMjpeg(jpegs, 8, 8, fps = 5)
    val notAvi = "just text, no RIFF here".getBytes("UTF-8")
    val truncated = java.util.Arrays.copyOfRange(avi, 0, avi.length / 2)
    val out = Multimodal.videoFrames(
      Seq((1L, notAvi), (2L, truncated), (3L, Array.empty[Byte]))
        .toDF("video_id", "payload"), "video_id", "payload", stride = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("decoded")).toMap
    assert(out(1L) === false && out(3L) === false)
    // a truncated AVI either fails cleanly or yields only complete frames
    val t = Multimodal.aviFramePayloads(truncated)
    assert(t.isEmpty || t.get.length < 3)
  }

  test("frame sampling keeps every stride-th frame with per-frame features") {
    val out = Multimodal.sampleFrames(blobs, "doc_id", "payload", frameBytes = 16, stride = 2)
    val row = out.join(Tables.documents(spark, sfDir), "doc_id")
      .select(col("n_frames"), col("n_sampled"), col("n_chars")).head()
    val (nFrames, nSampled, nChars) = (row.getInt(0), row.getInt(1), row.getLong(2))
    assert(nFrames === (nChars / 16).toInt)
    assert(nSampled === (nFrames + 1) / 2)
    // frame features are byte means -> printable-ASCII range
    val bad = out.select(explode(col("frames")).as("f"))
      .filter(col("f._2") < 32 || col("f._2") > 127).count()
    assert(bad === 0)
    // frame indices are the sampled stride positions
    val idx = out.limit(1).select(explode(col("frames")).as("f"))
      .select(col("f._1")).collect().map(_.getInt(0)).toSeq
    assert(idx === idx.indices.map(_ * 2))
  }
}

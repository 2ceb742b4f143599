package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operations over opaque binary payloads (brief:
  * decode / feature-extract / resize / frame-sample). Image, audio AND
  * video decode are REAL — `javax.imageio` (PNG/JPEG/GIF/BMP),
  * `javax.sound.sampled` (WAV/PCM), and a RIFF walk + per-frame ImageIO
  * for MJPEG-in-AVI ([[videoFrames]]) — all inside JDK 17 with zero
  * added dependencies; payloads those cannot decode (other video
  * codecs genuinely need external libraries) fall back to
  * deterministic byte arithmetic so the operators stay total over
  * arbitrary blobs. The Spark contracts are real throughout: binary
  * columns in, typed rows out, per-partition batch processing,
  * array-of-struct frame output, pushdown-friendly metadata columns
  * alongside the blob.
  *
  * Scale shape: every operator is mapPartitions over the binary column —
  * embarrassingly parallel, no shuffle; the payload never moves except
  * partition-local, which is the only viable pattern when the column is
  * megabytes per row at 100 TB total.
  */
object Multimodal {

  // ImageIO's default scratch-file cache turns every decode into disk
  // I/O on the executor; decode fully in memory instead.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode + resize: ImageIO-decodes the payload, resamples it to the
    * target geometry by nearest-neighbor (integer source-index
    * arithmetic — bit-identical across JVMs, unlike a Graphics2D
    * interpolating render), and emits pixel-derived features. Rows
    * stream through one partition at a time (bounded memory).
    *
    * Output per row: target geometry, payload size, a checksum over the
    * RESIZED pixels (order-sensitive, so it witnesses real decode),
    * `decoded` = whether ImageIO recognized the payload, and the source
    * geometry (-1 when undecodable). Undecodable payloads keep the
    * deterministic byte-arithmetic checksum so mixed/corrupt corpora
    * flow through without exceptions — filter on `decoded` downstream.
    */
  def resize(df: DataFrame, idCol: String, blobCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"target geometry must be positive: ${targetW}x$targetH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeResize(bytes, targetW, targetH) match {
            case Some((srcW, srcH, checksum)) =>
              (id, targetW, targetH, bytes.length, checksum, true, srcW, srcH)
            case None =>
              (id, targetW, targetH, bytes.length, stubChecksum(bytes, targetW), false, -1, -1)
          }
        }
      }
      .toDF(idCol, "width", "height", "src_bytes", "pixel_checksum",
        "decoded", "src_width", "src_height")
  }

  /** Decompression-bomb guard: a few-KB container can DECLARE a raster
    * whose allocation OOMs the executor (an Error, not an Exception —
    * uncatchable by the fallback), so geometry is read from the HEADER
    * and oversized images bail to None before any pixel is allocated.
    * 64 M pixels ≈ 256 MB of int raster — far above any sane thumbnail
    * source, well below executor memory. */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** ImageIO decode with the bomb guard: geometry comes from the header
    * (no raster allocated yet) and oversized declarations bail to None,
    * as do unrecognized formats and truncated containers. */
  private[llm] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis)
          // header-only geometry read — no raster allocation yet
          val (dw, dh) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
          if (dw <= 0 || dh <= 0 || dw * dh > MaxDecodePixels) null
          else reader.read(0)
        } finally { reader.dispose(); iis.close() }
      Option(img).filter(i => i.getWidth > 0 && i.getHeight > 0)
    } catch { case _: Exception => None }

  /** Order-sensitive rolling hash over the full RGB raster in row-major
    * order — any single pixel returned differently by a codec changes it. */
  private[llm] def pixelChecksum(img: java.awt.image.BufferedImage): Long = {
    var acc = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        acc = (acc * 31 + (img.getRGB(x, y) & 0xffffff)) % 1000000007L
        x += 1
      }
      y += 1
    }
    acc
  }

  /** The real codec path: ImageIO decode + nearest-neighbor resample.
    * Returns (srcWidth, srcHeight, checksum over resized RGB pixels in
    * row-major order), or None when the payload is not a decodable
    * image. Unrecognized formats, truncated containers, and
    * declared-geometry bombs all map to None. */
  private[llm] def decodeResize(bytes: Array[Byte], w: Int, h: Int): Option[(Int, Int, Long)] =
    decodeImage(bytes).map { img =>
      val (sw, sh) = (img.getWidth, img.getHeight)
      var acc = 0L
      var y = 0
      while (y < h) {
        val sy = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * sw / w).toInt
          acc = (acc * 31 + (img.getRGB(sx, sy) & 0xffffff)) % 1000000007L
          x += 1
        }
        y += 1
      }
      (sw, sh, acc)
    }

  /** Fallback for undecodable payloads: deterministic byte arithmetic
    * (position-weighted rolling hash) so the operator is total. */
  private[llm] def stubChecksum(bytes: Array[Byte], targetW: Int): Long =
    bytes.indices.foldLeft(0L) { (a, i) =>
      (a * 31 + (bytes(i) & 0xff) * ((i % targetW) + 1)) % 1000000007L
    }

  /** Audio frame features: REAL WAV (RIFF/PCM) decode via
    * `javax.sound.sampled` (in the JDK, like ImageIO) — the payload is
    * parsed as 16-bit signed PCM, chunked into `frameSamples`-sample
    * frames, and every `stride`-th frame emits (frame index, sum of
    * absolute sample values) — an exact-integer energy feature, so the
    * decode is oracle-pinnable (WAV is lossless). Non-WAV payloads
    * (or compressed/float encodings the JDK doesn't ship codecs for)
    * yield `decoded = false` with empty frames; route those through the
    * byte-level [[sampleFrames]] instead. */
  def audioFrames(df: DataFrame, idCol: String, blobCol: String,
      frameSamples: Int, stride: Int): DataFrame = {
    require(frameSamples > 0 && stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWav(bytes) match {
            case Some((rate, samples)) =>
              val nFrames = samples.length / frameSamples
              val frames = (0 until nFrames by stride).map { f =>
                var s = 0L
                var i = f * frameSamples
                while (i < (f + 1) * frameSamples) { s += math.abs(samples(i).toLong); i += 1 }
                (f, s)
              }
              (id, true, rate, samples.length, nFrames, frames)
            case None =>
              (id, false, -1, 0, 0, Seq.empty[(Int, Long)])
          }
        }
      }
      .toDF(idCol, "decoded", "sample_rate", "n_samples", "n_frames", "frames")
      .withColumn("n_sampled", size(col("frames")))
  }

  /** WAV decode: 16-bit signed PCM mono only (what the JDK decodes
    * without add-on codecs); anything else — non-RIFF payloads, float
    * or compressed encodings, multichannel — maps to None. */
  private[llm] def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) =
            (if (fmt.isBigEndian) ((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)
             else ((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
          i += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch { case _: Exception => None }

  /** REAL video frame sampling for MJPEG-in-AVI: the AVI RIFF container
    * is a public, trivially-walkable chunk format, and in an MJPEG AVI
    * every `..dc`/`..db` chunk inside the `movi` LIST is one complete
    * JPEG that [[decodeImage]] (ImageIO, in the JDK) already decodes —
    * so this one container/codec pair needs zero added dependencies.
    * Every `stride`-th frame is decoded and emits (frame index, pixel
    * checksum); geometry comes from the first decoded frame.
    *
    * Payloads that are not RIFF-AVI (or whose frames aren't
    * ImageIO-decodable) yield `decoded = false` with empty frames —
    * route those through the byte-level [[sampleFrames]] stub instead
    * (other codecs genuinely need libraries the JDK does not ship).
    * Same scale shape as the other codecs: mapPartitions over the
    * binary column, no shuffle, payload never leaves its partition. */
  def videoFrames(df: DataFrame, idCol: String, blobCol: String,
      stride: Int): DataFrame = {
    require(stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          aviFramePayloads(bytes) match {
            case Some(payloads) =>
              val sampled = (0 until payloads.length by stride)
                .map(f => f -> decodeImage(payloads(f)))
              val decodedAll = sampled.forall(_._2.isDefined)
              val first = sampled.collectFirst { case (_, Some(img)) => img }
              val frames = sampled.collect { case (f, Some(img)) => (f, pixelChecksum(img)) }
              (id, decodedAll && frames.nonEmpty,
                first.map(_.getWidth).getOrElse(-1), first.map(_.getHeight).getOrElse(-1),
                payloads.length, frames)
            case None =>
              (id, false, -1, -1, 0, Seq.empty[(Int, Long)])
          }
        }
      }
      .toDF(idCol, "decoded", "width", "height", "n_frames", "frames")
      .withColumn("n_sampled", size(col("frames")))
  }

  /** RIFF-AVI walk: returns the raw payload of every video-data chunk
    * (`..dc` compressed / `..db` uncompressed, any stream number) under
    * the `movi` LIST, in file order — for MJPEG each payload is one
    * JPEG. None for non-AVI payloads; truncated files yield the frames
    * that fit (the container is a stream format — a partial tail loses
    * only the frames inside it). `rec ` grouping LISTs inside `movi`
    * are descended transparently. */
  private[llm] def aviFramePayloads(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    def cc(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = cc(off)
        val size = u32(off + 4)
        val body = off + 8
        if (size > end - body) return // truncated chunk: stop this level
        val sz = size.toInt
        if (id == "LIST" && sz >= 4)
          walk(body + 4, body + sz, inMovi || cc(body) == "movi")
        else if (inMovi && sz > 0 &&
            (id.endsWith("dc") || id.endsWith("db")) &&
            id.take(2).forall(_.isDigit))
          frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
        off = body + sz + (sz & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, math.min(bytes.length.toLong, 8 + u32(4)).toInt, inMovi = false)
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  /** Minimal MJPEG-in-AVI writer (RIFF + hdrl/avih/strl + movi of `00dc`
    * JPEG chunks) — the generator side of the lossless roundtrip gate
    * (q112 / MultimodalSpec), and the inverse of [[aviFramePayloads]]. */
  private[llm] def encodeAviMjpeg(jpegFrames: Seq[Array[Byte]],
      w: Int, h: Int, fps: Int): Array[Byte] = {
    require(jpegFrames.nonEmpty && fps > 0)
    def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]) =
      cc(id) ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    def list(lt: String, bodies: Array[Byte]*) =
      chunk("LIST", cc(lt) ++ bodies.flatten)
    val maxFrame = jpegFrames.map(_.length).max
    val avih = le32(1000000 / fps) ++ le32(maxFrame * fps) ++ le32(0) ++
      le32(0) ++ le32(jpegFrames.length) ++ le32(0) ++ le32(1) ++
      le32(maxFrame) ++ le32(w) ++ le32(h) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) // reserved[4]
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(jpegFrames.length) ++
      le32(maxFrame) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h) // rcFrame
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      cc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val movi = list("movi", jpegFrames.map(chunk("00dc", _)): _*)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  /** Byte-level frame sampling: treats the payload as a sequence of
    * fixed-size frames and keeps every `stride`-th one, emitting an
    * array of per-frame feature structs (the batch shape a video
    * pipeline needs). The per-frame feature is byte arithmetic — the
    * total fallback for video payloads in containers/codecs the JVM
    * cannot decode (MJPEG-in-AVI has the real path, [[videoFrames]]). */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          val sampled = (0 until nFrames by stride).map { f =>
            val start = f * frameBytes
            // STUB per-frame "feature": mean byte of the frame window
            var s = 0L
            var i = start
            while (i < start + frameBytes) { s += bytes(i) & 0xff; i += 1 }
            (f, math.floor(s.toDouble / frameBytes * 10000.0 + 0.5) / 10000.0)
          }
          (id, nFrames, sampled)
        }
      }
      .toDF(idCol, "n_frames", "frames")
      .withColumn("n_sampled", size(col("frames")))
  }
}

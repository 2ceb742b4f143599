package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operations over opaque binary payloads (brief:
  * decode / feature-extract / resize / frame-sample). Image and audio
  * decode are REAL — `javax.imageio` (PNG/JPEG/GIF/BMP) and
  * `javax.sound.sampled` (WAV/PCM) ship inside JDK 17 with zero added
  * dependencies; payloads those cannot decode, and the video frame path
  * (no JDK codec exists), fall back to deterministic byte arithmetic so
  * the operators stay total over arbitrary blobs. The Spark contracts are real throughout: binary
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

  /** The real codec path: ImageIO decode + nearest-neighbor resample.
    * Returns (srcWidth, srcHeight, checksum over resized RGB pixels in
    * row-major order), or None when the payload is not a decodable
    * image. Unrecognized formats, truncated containers, and
    * declared-geometry bombs all map to None. */
  private[llm] def decodeResize(bytes: Array[Byte], w: Int, h: Int): Option[(Int, Int, Long)] =
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
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
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
        Some((sw, sh, acc))
      }
    } catch { case _: Exception => None }

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

  /** Byte-level frame sampling: treats the payload as a sequence of
    * fixed-size frames and keeps every `stride`-th one, emitting an
    * array of per-frame feature structs (the batch shape a video
    * pipeline needs). The per-frame feature is byte arithmetic — a
    * REAL video decode needs codecs the JDK does not ship, so this
    * stays the documented stub for video payloads. */
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

package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operations over opaque binary payloads (brief:
  * decode / feature-extract / resize / frame-sample). The codec bodies
  * are STUBS — deterministic byte arithmetic standing in for image/audio
  * libraries this container doesn't ship — but the Spark contracts are
  * real: binary columns in, typed rows out, per-partition batch
  * processing, array-of-struct frame output, and pushdown-friendly
  * metadata columns alongside the blob.
  *
  * Scale shape: every operator is mapPartitions over the binary column —
  * embarrassingly parallel, no shuffle; the payload never moves except
  * partition-local, which is the only viable pattern when the column is
  * megabytes per row at 100 TB total.
  */
object Multimodal {

  /** "Decode + resize": emits fake image metadata at a target geometry.
    * A real implementation swaps `stubResize` for a codec call; rows
    * stream through one partition at a time (bounded memory). */
  def resize(df: DataFrame, idCol: String, blobCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: real impl decodes + resamples pixels; the fake derives
          // a deterministic "pixel checksum" of the target geometry
          val checksum = bytes.indices.foldLeft(0L) { (a, i) =>
            (a * 31 + (bytes(i) & 0xff) * ((i % targetW) + 1)) % 1000000007L
          }
          (id, targetW, targetH, bytes.length, checksum)
        }
      }
      .toDF(idCol, "width", "height", "src_bytes", "pixel_checksum")
  }

  /** "Frame sampling": treats the payload as a sequence of fixed-size
    * frames and keeps every `stride`-th one, emitting an array of
    * per-frame feature structs (the batch shape a video pipeline needs). */
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

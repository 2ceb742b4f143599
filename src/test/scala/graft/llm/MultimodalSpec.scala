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

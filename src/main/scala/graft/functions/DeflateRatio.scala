package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression ratio (deflated bytes / raw UTF-8 bytes) as a native
  * expression — the Dolma/Gopher-lineage repetition proxy: highly
  * repetitive or templated text compresses far below prose, and the
  * ratio is a single cheap scalar a quality gate can threshold without
  * building n-gram tables. Empty input is defined as 0.0.
  *
  * Determinism: zlib level 6 on the same bytes is a fixed algorithm —
  * the value is reproducible across runs and partitions (the oracle
  * still cannot recompute it relationally, so q153 gates invariants,
  * not values: the q65/q135 pattern).
  *
  * One `Deflater` is reused per thread (reset between rows): the
  * native zlib stream allocation dwarfs per-row work, and expression
  * instances are shared across a task's rows, so a per-eval allocation
  * would dominate the scan at corpus scale. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects a string, got ${child.dataType}")
  override def prettyName: String = "deflate_ratio"

  @transient private lazy val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
  }
  @transient private lazy val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16 * 1024)
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 0.0
    else {
      val d = deflaters.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      val buf = buffers.get()
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateRatio", this, classOf[DeflateRatio].getName)
    defineCodeGen(ctx, ev, c => s"((java.lang.Double) $ref.nullSafeEval($c)).doubleValue()")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

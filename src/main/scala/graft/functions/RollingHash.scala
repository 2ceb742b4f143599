package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: fold (h·31 + byte) mod P over the
  * UTF-8 bytes — the MinHash/SimHash/fingerprint token hash
  * (graft.llm.LlmQueries).
  *
  * The composable formulation — `aggregate(filter(split(tok, '')), …)`
  * — materializes a per-character array and walks it through interpreted
  * higher-order lambdas; for shingle hashing that dominates the near-dup
  * pipeline's runtime. This expression hashes the UTF8String's bytes in
  * place (no split, no array), and `doGenCode` keeps it inside
  * whole-stage codegen.
  *
  * For ASCII input the byte fold equals the per-character `ascii()` fold
  * and DuckDB's `ord()` reduce, which is what the oracle recomputes —
  * the corpus contract is ASCII text (enforced by the testdata).
  */
case class RollingHash(child: Expression, modulus: Long = 1000000007L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31L + (s.getByte(i) & 0xff)) % modulus
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = $c.numBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * 31L + ($c.getByte($i) & 0xff)) % ${modulus}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

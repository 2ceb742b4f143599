package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused squared Euclidean distance over two array<double> columns —
  * the [[CosineSimilarity]] treatment for the OTHER hot vector kernel
  * (IVF centroid ranking, PQ encode argmin / ADC, the q114 gates).
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) => (x-y)²))` —
  * is a higher-order function: Catalyst evaluates it INTERPRETED (HOFs
  * are CodegenFallback) and allocates an intermediate array per call.
  * Inside a PQ argmin that fold runs once per codeword per subspace per
  * row — k·m interpreted array walks with k·m allocations per vector.
  * This expression is one allocation-free Java loop that whole-stage
  * codegen inlines.
  *
  * Accumulation order is the same sequential left-to-right as the fold
  * it replaces — bit-identical on arrays of non-null doubles, which is
  * what every call site feeds it. Null-ELEMENT contract differs from
  * the fold and matches [[CosineSimilarity]]: a null element reads as
  * 0.0 (`getDouble` on a null slot), where the HOF fold would yield
  * NULL for the whole distance. Mismatched lengths yield NULL (the
  * cosine_sim contract: malformed input is a detectable absence). */
case class SqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sq_dist expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null children OR length mismatch
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = xs.getDouble(i) - ys.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense matrix × vector over array<double> columns: the left operand
  * is a FLAT row-major matrix (d_out·d_in elements, normally a
  * constant-folded literal — the OPQ rotation is 64×64 = 32 KB, far
  * under any plan-literal hazard), the right is the per-row vector;
  * out(i) = Σ_j M(i·d_in + j)·v(j).
  *
  * The composable form — `transform(sequence(...), i => aggregate(...))`
  * — is a nest of higher-order functions: interpreted (HOFs are
  * CodegenFallback), one intermediate array per output element per row.
  * Applying a d×d rotation that way costs d interpreted folds with d
  * allocations per vector; this is one allocation-per-ROW Java loop
  * pair that whole-stage codegen inlines — the [[SqDist]] argument, one
  * level up in shape.
  *
  * Contract: d_out is derived as M.length / v.length; a matrix length
  * not divisible by the vector length yields NULL (malformed input is a
  * detectable absence, the cosine_sim rule), as does an empty vector.
  * Null ELEMENTS read as 0.0 (`getDouble` on a null slot), matching the
  * other native kernels. */
case class MatVec(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_vec"

  override def nullSafeEval(m: Any, v: Any): Any = {
    val mat = m.asInstanceOf[ArrayData]
    val vec = v.asInstanceOf[ArrayData]
    val dIn = vec.numElements()
    if (dIn == 0 || mat.numElements() % dIn != 0) return null
    val dOut = mat.numElements() / dIn
    val out = new Array[Double](dOut)
    var i = 0
    while (i < dOut) {
      var acc = 0.0
      var j = 0
      val base = i * dIn
      while (j < dIn) {
        acc += mat.getDouble(base + j) * vec.getDouble(j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, v) => {
      val dIn = ctx.freshName("dIn")
      val dOut = ctx.freshName("dOut")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $dIn = $v.numElements();
         |if ($dIn == 0 || $m.numElements() % $dIn != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $dOut = $m.numElements() / $dIn;
         |  double[] $out = new double[$dOut];
         |  for (int $i = 0; $i < $dOut; $i++) {
         |    double $acc = 0.0;
         |    int $base = $i * $dIn;
         |    for (int $j = 0; $j < $dIn; $j++) {
         |      $acc += $m.getDouble($base + $j) * $v.getDouble($j);
         |    }
         |    $out[$i] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVec =
    copy(left = newLeft, right = newRight)
}

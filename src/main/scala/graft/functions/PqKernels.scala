package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization kernels — the two inner loops of the
  * PQ/IVFADC tier ([[graft.llm.ProductQuant]]), which the composable
  * formulation leaves interpreted: `aggregate(sequence(...), struct,
  * ...)` per subspace for encode and `aggregate(transform(...))` per
  * candidate row for the ADC distance are higher-order functions, i.e.
  * CodegenFallback — one closure dispatch and one intermediate
  * allocation per codeword per row. At 100 TB these ARE the scan:
  * encode touches every corpus row once at index build/ingest, and the
  * ADC distance runs per (query × candidate) during serving. Both
  * kernels emit plain Java loop nests that whole-stage codegen inlines,
  * zero allocation beyond the output, bit-identical accumulation order
  * to the HOF folds they replace (sequential left-to-right within a
  * subspace, subspace partials summed left-to-right; strict-< first-
  * wins argmin ties — the [[graft.llm.ProductQuant]] determinism
  * contract).
  *
  * Codebooks arrive FLAT row-major: entry (subspace j, codeword c,
  * component t) at index (j·k + c)·subDim — [[graft.llm.ProductQuant]]
  * pads ragged per-subspace codebooks (k clamped to the distinct
  * sample count) by repeating the last codeword, which strict-<
  * first-wins ties make invisible to the argmin. Malformed inputs
  * (lengths that don't factor) yield NULL — a detectable absence, the
  * `cosine_sim` rule. */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_encode expects (array<double> codebooks, array<double> vec, int k, int m), got (" +
          s"${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(cbAny: Any, vAny: Any, kAny: Any, mAny: Any): Any = {
    val cb = cbAny.asInstanceOf[ArrayData]
    val v = vAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val m = mAny.asInstanceOf[Int]
    val n = v.numElements()
    if (m <= 0 || k <= 0 || n % m != 0 || cb.numElements() != k * n) return null
    val subDim = n / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val vBase = j * subDim
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cbBase = (j * k + c) * subDim
        var d = 0.0; var t = 0
        while (t < subDim) {
          val diff = v.getDouble(vBase + t) - cb.getDouble(cbBase + t)
          d += diff * diff; t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cb, v, k, m) => {
      val n = ctx.freshName("n")
      val subDim = ctx.freshName("subDim")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val vBase = ctx.freshName("vBase")
      val cbBase = ctx.freshName("cbBase")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = $v.numElements();
         |if ($m <= 0 || $k <= 0 || $n % $m != 0 || $cb.numElements() != $k * $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $subDim = $n / $m;
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $vBase = $j * $subDim;
         |    int $best = -1;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $k; $c++) {
         |      int $cbBase = ($j * $k + $c) * $subDim;
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $subDim; $t++) {
         |        double $diff = $v.getDouble($vBase + $t) - $cb.getDouble($cbBase + $t);
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Asymmetric (query-to-codes) PQ distance: Σ_j ‖q_sub_j −
  * codeword(codes_j)‖² over the flat codebook layout [[PqEncode]]
  * documents. m derives from the CODES length, subDim from the query
  * length — a code outside [0, k), a NULL code slot, or lengths that
  * don't factor yield NULL (quarantined rows stay detectable and sort
  * after every real candidate in the ascending top-k window, exactly
  * like the HOF fold's null propagation). */
case class PqAdcDist(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_adc_dist expects (array<double> codebooks, array<double> query, array<int> codes, int k), got (" +
          s"${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_dist"

  override def nullSafeEval(cbAny: Any, qAny: Any, codesAny: Any, kAny: Any): Any = {
    val cb = cbAny.asInstanceOf[ArrayData]
    val q = qAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val m = codes.numElements()
    val n = q.numElements()
    if (m <= 0 || k <= 0 || n % m != 0 || cb.numElements() != k * n) return null
    val subDim = n / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return null
      val qBase = j * subDim
      val cbBase = (j * k + c) * subDim
      var d = 0.0; var t = 0
      while (t < subDim) {
        val diff = q.getDouble(qBase + t) - cb.getDouble(cbBase + t)
        d += diff * diff; t += 1
      }
      acc += d
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cb, q, codes, k) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val subDim = ctx.freshName("subDim")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val qBase = ctx.freshName("qBase")
      val cbBase = ctx.freshName("cbBase")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $codes.numElements();
         |int $n = $q.numElements();
         |if ($m <= 0 || $k <= 0 || $n % $m != 0 || $cb.numElements() != $k * $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $subDim = $n / $m;
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $m && !$bad; $j++) {
         |    if ($codes.isNullAt($j)) { $bad = true; break; }
         |    int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $k) { $bad = true; break; }
         |    int $qBase = $j * $subDim;
         |    int $cbBase = ($j * $k + $c) * $subDim;
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $subDim; $t++) {
         |      double $diff = $q.getDouble($qBase + $t) - $cb.getDouble($cbBase + $t);
         |      $d += $diff * $diff;
         |    }
         |    $acc += $d;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): PqAdcDist =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

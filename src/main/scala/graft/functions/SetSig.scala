package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** 256-bit set-membership signature: word w bit o is set iff some
  * element h of the input has (h & 255) == 64·w + o. One pass, zero
  * allocation beyond the 4-long result.
  *
  * The point of this signature is the SOUND symmetric-difference bound
  * it gives a set-similarity join (q118): each element of A Δ B flips
  * at most one bit of sig(A) ⊕ sig(B) (and collisions only CLEAR bits),
  * so popcount(sig(A) ⊕ sig(B)) ≤ |A Δ B| always. Jaccard(A,B) ≥ θ
  * forces |A Δ B| ≤ |A|+|B| − 2·⌈θ/(1+θ)·(|A|+|B|)⌉, so a candidate
  * pair whose xor-popcount exceeds that bound is REJECTED WITHOUT LOSING
  * ANY TRUE PAIR — an exact filter, unlike MinHash banding, and 8 bytes
  * × 4 per row instead of the full token array. Reference semantics:
  * exact near-dup enumeration (fraud-detection's pandas `duplicated`
  * lineage generalized to Jaccard, see SURVEY §2 LLM tier). */
case class SetSig256(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"set_sig256 expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "set_sig256"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val words = new Array[Long](4)
    var j = 0
    val n = hs.numElements()
    while (j < n) {
      val b = (hs.getLong(j) & 255L).toInt
      words(b >> 6) |= (1L << (b & 63))
      j += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val words = ctx.freshName("words")
      s"""
         |int $n = $c.numElements();
         |long[] $words = new long[4];
         |for (int $j = 0; $j < $n; $j++) {
         |  int $b = (int) ($c.getLong($j) & 255L);
         |  $words[$b >> 6] |= (1L << ($b & 63));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SetSig256 =
    copy(child = newChild)
}

/** popcount(a ⊕ b) over two equal-length array<long> columns — the
  * cheap half of the [[SetSig256]] filter: four xors and four
  * `Long.bitCount`s per candidate row, all inside whole-stage codegen.
  * NULL on length mismatch (malformed signature = detectable absence,
  * the [[CosineSimilarity]] convention). */
case class XorPopcount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"xor_popcount expects (array<bigint>, array<bigint>), got ($l, $r)")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "xor_popcount"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(xs.getLong(i) ^ ys.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XorPopcount =
    copy(left = newLeft, right = newRight)
}

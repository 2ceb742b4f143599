package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine similarity over two array<double> columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, multiply))` for
  * the dot product plus two more aggregates for the norms — walks each
  * array three times and allocates an intermediate array per row. This
  * expression computes dot and both norms in ONE pass with zero
  * allocation, and `doGenCode` emits a plain Java loop so the whole
  * comparison stays inside whole-stage codegen — the hot path of the ANN
  * and embedding-dedup operators (SURVEY §7.4; brief: custom Catalyst
  * `Expression` with codegen over UDFs).
  *
  * Semantics match DuckDB's `list_cosine_similarity` (sequential
  * left-to-right accumulation in IEEE double), which is what keeps the
  * oracle hash-compare exact. Mismatched array lengths yield NULL —
  * a malformed embedding is a detectable absence, not a silently-wrong
  * similarity over the common prefix (the oracle errors on mismatch;
  * NULL is the closest per-row analogue that keeps the scan alive).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null children OR length mismatch
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i); val y = ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the engine's native functions —
  * `SparkSessionExtensions` is the public, idiomatic injection point
  * (used by Verify, Bench, and the test session builders). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("sq_dist"),
      new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
      (children: Seq[Expression]) => SqDist(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("mat_vec"),
      new ExpressionInfo(classOf[MatVec].getName, "mat_vec"),
      (children: Seq[Expression]) => MatVec(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) =>
        PqEncode(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_dist"),
      new ExpressionInfo(classOf[PqAdcDist].getName, "pq_adc_dist"),
      (children: Seq[Expression]) =>
        PqAdcDist(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("linear_score_attr"),
      new ExpressionInfo(classOf[LinearScoreAttr].getName, "linear_score_attr"),
      (children: Seq[Expression]) => LinearScoreAttr(children)))
    ext.injectFunction((
      FunctionIdentifier("gbt_score_attr"),
      new ExpressionInfo(classOf[GbtScoreAttr].getName, "gbt_score_attr"),
      (children: Seq[Expression]) => GbtScoreAttr(children)))
    ext.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (children: Seq[Expression]) => DeflateRatio(children.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigsExpr].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinHashSigsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("set_sig256"),
      new ExpressionInfo(classOf[SetSig256].getName, "set_sig256"),
      (children: Seq[Expression]) => SetSig256(children.head)))
    ext.injectFunction((
      FunctionIdentifier("xor_popcount"),
      new ExpressionInfo(classOf[XorPopcount].getName, "xor_popcount"),
      (children: Seq[Expression]) => XorPopcount(children.head, children(1))))
    // Catalyst ships bloom_filter_agg/might_contain for its own runtime
    // filters but does not register them in the SQL FunctionRegistry;
    // exposing them here lets graft.operators.BloomPrune build the same
    // plan shape InjectRuntimeFilter emits, on demand.
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, e) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, e)
        case Seq(c, e, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, e, n)
        case _ => throw new IllegalArgumentException(
          s"bloom_filter_agg expects 1-3 arguments, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))))
  }
}

package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused serving kernel for gradient-boosted-tree scoring WITH per-tree
  * path attribution — [[LinearScoreAttr]]'s sibling for the model family
  * the reference trains but never explains (train_model.py:69-80 fits
  * XGBoost; api/worker.py:52-53 only ever explains the linear model).
  * The round-10 verdict named that asymmetry: RunLog promotion can now
  * select the weighted GBT (q92), and a promoted model the explain path
  * can't attribute would break the `/explain` contract. This closes it
  * with the Saabas decomposition (Saabas 2014, "Interpreting random
  * forests"; the TreeSHAP paper's §2 baseline — Lundberg & Lee 2017
  * cite it as "Sabaas value"), which is EXACT for a sum of trees:
  *
  *   tree(x) = pred(root) + Σ_path (pred(child) − pred(node))
  *
  * telescopes along the root→leaf path, so attributing each step's
  * prediction delta to the split feature yields φ with
  * margin = Σ_m w_m·pred(root_m) + Σ_f φ_f identically (no sampling, no
  * background set — every internal node's `prediction` is the training
  * mean of its subtree, which Spark ML trees carry natively).
  *
  * Same latency discipline as the linear kernel: the whole model rides
  * as foldable literal children (flattened parallel node arrays — see
  * [[graft.xai.GbtAttr.flatten]]), decoded once per task; per row it is
  * one features-map traversal + one root→leaf walk per tree (depth ≤ 5,
  * 100 trees ⇒ ≤ 500 compares/row) + one JSON build, with no per-row
  * allocation beyond φ and the output row. Semantics:
  *  - feature alignment: ordered by `names`, absent/null 0.0, n_present
  *    counts model features present (xai_tasks.py:86-90 — identical to
  *    the linear kernel);
  *  - walk: left iff x ≤ threshold (Spark `ContinuousSplit` semantics);
  *  - margin = Σ w_m·leaf_m accumulated in tree order (the same
  *    sequential dot product `GBTClassificationModel.margin` computes),
  *    score = 1/(1+e^(−2·margin)) (Spark's logistic-loss raw→probability
  *    map), rounded half-up to 6 places;
  *  - shap_json carries every model feature in name order, φ rounded to
  *    6 places — byte-compatible with the linear kernel's payload, so
  *    the store/read path is model-family-agnostic.
  *
  * Children (9, all but the map foldable): features map<string,double>,
  * names array<string>, roots array<int> (per-tree root node id),
  * feat array<int> (split feature per node, −1 ⇒ leaf),
  * thresh array<double>, left/right array<int> (child node ids, −1 at
  * leaves), pred array<double> (per-node training mean),
  * weights array<double> (per-tree boosting weight).
  */
case class GbtScoreAttr(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 9)
      return TypeCheckResult.TypeCheckFailure(
        s"gbt_score_attr expects 9 args (features, names, roots, feat, thresh, " +
          s"left, right, pred, weights), got ${children.size}")
    val ok = children.map(_.dataType) match {
      case Seq(MapType(StringType, DoubleType, _), ArrayType(StringType, _),
            ArrayType(IntegerType, _), ArrayType(IntegerType, _),
            ArrayType(DoubleType, _), ArrayType(IntegerType, _),
            ArrayType(IntegerType, _), ArrayType(DoubleType, _),
            ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (!ok)
      TypeCheckResult.TypeCheckFailure(
        "gbt_score_attr type mismatch: got " + children.map(_.dataType).mkString(", "))
    else if (!children.drop(1).forall(_.foldable))
      TypeCheckResult.TypeCheckFailure(
        "gbt_score_attr model parameters must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("shap_json", StringType, nullable = false),
    StructField("n_present", IntegerType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "gbt_score_attr"

  @transient private lazy val names: Array[UTF8String] = {
    val a = children(1).eval().asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getUTF8String(i).clone())
  }
  @transient private lazy val roots: Array[Int] =
    children(2).eval().asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val feat: Array[Int] =
    children(3).eval().asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val thresh: Array[Double] =
    children(4).eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val left: Array[Int] =
    children(5).eval().asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val right: Array[Int] =
    children(6).eval().asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val pred: Array[Double] =
    children(7).eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val weights: Array[Double] =
    children(8).eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val nameIdx: java.util.HashMap[UTF8String, Integer] = {
    require(roots.length == weights.length,
      s"arity mismatch: ${roots.length} roots, ${weights.length} tree weights")
    require(feat.length == thresh.length && feat.length == left.length &&
        feat.length == right.length && feat.length == pred.length,
      "flattened node arrays must be parallel")
    val m = new java.util.HashMap[UTF8String, Integer](names.length * 2)
    names.zipWithIndex.foreach { case (n, i) => m.put(n, i) }
    m
  }
  @transient private lazy val jsonKeys: Array[String] =
    names.map(n => "\"" + n.toString.replace("\\", "\\\\").replace("\"", "\\\"") + "\":")

  private def round6(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** The per-row kernel (also the codegen target via a reference obj). */
  def evalMap(mAny: Any): InternalRow = {
    val m = mAny.asInstanceOf[MapData]
    val n = names.length
    val x = new Array[Double](n)
    var present = 0
    val keys = m.keyArray()
    val vals = m.valueArray()
    val sz = m.numElements()
    var i = 0
    while (i < sz) {
      if (!vals.isNullAt(i)) {
        val j = nameIdx.get(keys.getUTF8String(i))
        if (j != null) { x(j) = vals.getDouble(i); present += 1 }
      }
      i += 1
    }
    val phi = new Array[Double](n)
    var margin = 0.0
    var t = 0
    while (t < roots.length) {
      val w = weights(t)
      var node = roots(t)
      while (feat(node) >= 0) {
        val f = feat(node)
        val child = if (x(f) <= thresh(node)) left(node) else right(node)
        phi(f) += w * (pred(child) - pred(node))
        node = child
      }
      margin += w * pred(node)
      t += 1
    }
    val score = round6(1.0 / (1.0 + math.exp(-2.0 * margin)))
    val sb = new java.lang.StringBuilder(16 * n + 2)
    sb.append('{')
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(',')
      sb.append(jsonKeys(j))
      sb.append(round6(phi(j)))
      j += 1
    }
    sb.append('}')
    new GenericInternalRow(Array[Any](score, UTF8String.fromString(sb.toString), present))
  }

  override def eval(input: InternalRow): Any = {
    val m = children.head.eval(input)
    if (m == null) null else evalMap(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gsa", this, classOf[GbtScoreAttr].getName)
    val childGen = children.head.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      $rowCls ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.evalMap(${childGen.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GbtScoreAttr = copy(children = newChildren)
}

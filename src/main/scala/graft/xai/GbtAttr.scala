package graft.xai

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, typedLit}

/** Driver-side half of the GBT serving/XAI kernel: flattens a fitted
  * [[GBTClassificationModel]]'s tree ensemble into the parallel literal
  * arrays [[graft.functions.GbtScoreAttr]] walks per row (M7–M9 for the
  * boosted family; closes the reference's train/explain asymmetry —
  * train_model.py:69-80 trains XGBoost, api/worker.py:52-53 explains
  * only the linear model).
  *
  * The flattening is a one-time driver pass over O(trees · 2^depth)
  * nodes (100 × 63 at the reference's depth-5/100-tree config — a few
  * KB of literals broadcast inside the plan), after which scoring and
  * attribution never touch the ml.tree object graph again: the
  * streaming hot path stays a codegen'd expression over primitive
  * arrays, exactly like the linear kernel.
  *
  * Only continuous splits are supported — the reference's feature space
  * is all-float64 (Time, V1..V28, Amount; SURVEY §1.2 "no decimals, no
  * categoricals"), so a categorical split in a promoted model is a
  * contract violation worth failing loudly, not silently mis-walking.
  */
object GbtAttr {

  /** Parallel node arrays (node ids index every array; −1 = "no child"/
    * "leaf"), plus per-tree root ids and boosting weights. */
  final case class FlatTrees(
      roots: Array[Int], feat: Array[Int], thresh: Array[Double],
      left: Array[Int], right: Array[Int], pred: Array[Double],
      weights: Array[Double]) {
    def nNodes: Int = feat.length
    def nTrees: Int = roots.length
  }

  def flatten(model: GBTClassificationModel): FlatTrees = {
    val feat = scala.collection.mutable.ArrayBuffer.empty[Int]
    val thresh = scala.collection.mutable.ArrayBuffer.empty[Double]
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    val pred = scala.collection.mutable.ArrayBuffer.empty[Double]

    def add(node: Node): Int = node match {
      case l: LeafNode =>
        val id = feat.length
        feat += -1; thresh += 0.0; left += -1; right += -1; pred += l.prediction
        id
      case in: InternalNode =>
        val split = in.split match {
          case c: ContinuousSplit => c
          case other => throw new IllegalArgumentException(
            s"gbt attribution supports continuous splits only, got $other " +
              "(the reference's feature space is all-continuous; SURVEY §1.2)")
        }
        val id = feat.length
        // reserve this node's slot before recursing so ids stay preorder
        feat += split.featureIndex; thresh += split.threshold
        left += -1; right += -1; pred += in.prediction
        val l = add(in.leftChild)
        val r = add(in.rightChild)
        left(id) = l; right(id) = r
        id
    }

    val roots = model.trees.map(t => add(t.rootNode))
    FlatTrees(roots, feat.toArray, thresh.toArray, left.toArray,
      right.toArray, pred.toArray, model.treeWeights.clone())
  }

  /** The fused kernel as a Column: struct(score, shap_json, n_present)
    * over a `map<string,double>` features column — drop-in for the
    * linear kernel's call site in
    * [[graft.streaming.ScoringStream.scoreBatch]]. */
  def column(features: Column, names: Seq[String], ft: FlatTrees): Column =
    call_function("gbt_score_attr", features,
      typedLit(names), typedLit(ft.roots.toSeq), typedLit(ft.feat.toSeq),
      typedLit(ft.thresh.toSeq), typedLit(ft.left.toSeq),
      typedLit(ft.right.toSeq), typedLit(ft.pred.toSeq),
      typedLit(ft.weights.toSeq))
}

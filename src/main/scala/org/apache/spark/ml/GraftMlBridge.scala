package org.apache.spark.ml

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}

/** Bridge into the `private[ml]` decision-tree internals — the per-leaf
  * class-count statistics and split structure a trained
  * [[RandomForestClassificationModel]] holds but does not expose.
  *
  * Why: the driver's correctness oracle replays every query in DuckDB, and
  * a trained forest IS replayable — each tree is a nested CASE expression
  * and the forest probability is the exact average of per-leaf class
  * distributions (`predictRaw` sums `count_c / total` per tree). The only
  * thing standing between `ml_rf_score` and a full oracle is access to the
  * fitted tree structure; this bridge converts it into a plain ADT the SQL
  * compiler ([[graft.ml.RfSqlCompiler]]) walks. Same pattern as
  * [[org.apache.spark.sql.GraftSqlBridge]] for the Column/Expression seam.
  */
object GraftMlBridge {

  sealed trait GTree
  /** Leaf: per-class training counts (`impurityStats.stats`) — the exact
    * integers Spark divides by their sum in `predictRaw`. */
  final case class GLeaf(stats: Array[Double]) extends GTree
  /** Continuous split: goes left iff `features(featureIndex) <= threshold`. */
  final case class GSplit(featureIndex: Int, threshold: Double,
      left: GTree, right: GTree) extends GTree
  /** Categorical split: goes left iff `features(featureIndex)` is in
    * `leftCategories` (the OHE binary columns train as 2-category features). */
  final case class GCatSplit(featureIndex: Int, leftCategories: Array[Double],
      left: GTree, right: GTree) extends GTree

  /** The fitted trees, in the exact order `predictRaw` accumulates them. */
  def trees(m: RandomForestClassificationModel): Array[GTree] =
    m.trees.map(t => conv(t.rootNode))

  private def conv(n: Node): GTree = n match {
    case l: LeafNode => GLeaf(l.impurityStats.stats.clone())
    case i: InternalNode => i.split match {
      case c: ContinuousSplit =>
        GSplit(c.featureIndex, c.threshold, conv(i.leftChild), conv(i.rightChild))
      case c: CategoricalSplit =>
        GCatSplit(c.featureIndex, c.leftCategories.clone(),
          conv(i.leftChild), conv(i.rightChild))
    }
  }
}

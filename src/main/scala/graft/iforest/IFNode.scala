package graft.iforest

/**
 * Isolation-tree node ADT.
 *
 * Capability parity with the reference tree structure
 * (reference: IFNode.scala:3-22) re-expressed as Scala case classes so the
 * whole forest is trivially serializable/broadcastable.
 */
sealed abstract class IFNode extends Serializable

final case class IFInternalNode(
    left: IFNode,
    right: IFNode,
    featureIndex: Int,
    featureValue: Double) extends IFNode

final case class IFLeafNode(numInstance: Long) extends IFNode

/**
 * Flattened tree row for persistence. Pre-order ids; leaf sentinel is
 * `featureIndex = -1` with child ids `-1` (layout parity with the
 * reference's parquet model format, reference: IForest.scala:189-228, so
 * saved models stay interchangeable).
 */
final case class NodeData(
    id: Int,
    featureIndex: Int,
    featureValue: Double,
    leftChild: Int,
    rightChild: Int,
    numInstance: Long)

final case class EnsembleNodeData(treeID: Int, nodeData: NodeData)

object NodeData {

  /** Pre-order flatten of a pointer tree (reference: IForest.scala:207-217). */
  def flatten(root: IFNode): Seq[NodeData] = build(root, 0)._1

  private def build(node: IFNode, id: Int): (Seq[NodeData], Int) = node match {
    case leaf: IFLeafNode =>
      (Seq(NodeData(id, -1, 0.0, -1, -1, leaf.numInstance)), id)
    case internal: IFInternalNode =>
      val (leftRows, leftMax) = build(internal.left, id + 1)
      val (rightRows, rightMax) = build(internal.right, leftMax + 1)
      val row = NodeData(id, internal.featureIndex, internal.featureValue,
        id + 1, leftMax + 1, 0L)
      (row +: (leftRows ++ rightRows), rightMax)
  }

  /**
   * Re-link a flattened tree. Pre-order ids are contiguous and children have
   * strictly larger ids than parents, so a reverse pass can link children
   * before their parents (reference: IForest.scala:259-281).
   */
  def rebuild(data: Array[NodeData]): IFNode = {
    require(data.nonEmpty, "cannot rebuild a tree from zero nodes")
    val sorted = data.sortBy(_.id)
    val nodes = new Array[IFNode](sorted.length)
    var i = sorted.length - 1
    while (i >= 0) {
      val d = sorted(i)
      nodes(i) =
        if (d.featureIndex == -1) IFLeafNode(d.numInstance)
        else IFInternalNode(nodes(d.leftChild), nodes(d.rightChild),
          d.featureIndex, d.featureValue)
      i -= 1
    }
    nodes(0)
  }
}

/** Math kernel shared by training and scoring (Liu/Ting/Zhou, ICDM 2008). */
object IsolationMath {

  /** Euler–Mascheroni constant (reference: IForest.scala:171). */
  val EulerGamma: Double = 0.5772156649

  /**
   * Average path length c(n) of an unsuccessful BST search:
   * `2 * H(n-1) - 2 * (n-1) / n`, with `H(i) ~= ln(i) + gamma`.
   * 1.0 at n == 2; 0 below (reference: IForest.scala:151-158).
   */
  def avgLength(n: Double): Double =
    if (n > 2) 2 * (math.log(n - 1) + EulerGamma) - 2 * (n - 1) / n
    else if (n == 2) 1.0
    else 0.0

  /** Anomaly score `2 ^ (-avgPathLength / c(possibleMaxSamples))`. */
  def score(avgPathLength: Double, normFactor: Double): Double =
    math.pow(2, -avgPathLength / normFactor)
}

/**
 * Struct-of-arrays encoding of one isolation tree for allocation-free,
 * iterative scoring (no recursion, no pointer chasing). Leaf adjustment
 * `c(numInstance)` is pre-computed once at encode time instead of per row
 * (the reference recomputes it inside the scoring UDF for every row,
 * reference: IForest.scala:133-144 — hoisted here per SURVEY §4).
 */
final class FlatTree private (
    val featureIndex: Array[Int],
    val featureValue: Array[Double],
    val left: Array[Int],
    val right: Array[Int],
    val leafAdjustment: Array[Double]) extends Serializable {

  /** Path length of one instance through this tree. */
  def pathLength(features: org.apache.spark.ml.linalg.Vector): Double =
    pathLength(features match {
      case d: org.apache.spark.ml.linalg.DenseVector => d.values
      case s => s.toArray
    })

  /** Array form: callers scoring a whole forest extract the backing array
    * once per row instead of paying a virtual Vector.apply per node visit
    * (numTrees x depth accesses per row). */
  def pathLength(values: Array[Double]): Double = {
    var id = 0
    var depth = 0.0
    while (featureIndex(id) >= 0) {
      id = if (values(featureIndex(id)) < featureValue(id)) left(id) else right(id)
      depth += 1.0
    }
    depth + leafAdjustment(id)
  }
}

object FlatTree {
  def fromNodes(root: IFNode): FlatTree = fromNodeData(NodeData.flatten(root).toArray)

  def fromNodeData(data: Array[NodeData]): FlatTree = {
    val sorted = data.sortBy(_.id)
    val n = sorted.length
    val fi = new Array[Int](n)
    val fv = new Array[Double](n)
    val l = new Array[Int](n)
    val r = new Array[Int](n)
    val adj = new Array[Double](n)
    var i = 0
    while (i < n) {
      val d = sorted(i)
      fi(i) = d.featureIndex
      fv(i) = d.featureValue
      l(i) = d.leftChild
      r(i) = d.rightChild
      adj(i) = if (d.featureIndex == -1) IsolationMath.avgLength(d.numInstance.toDouble) else 0.0
      i += 1
    }
    new FlatTree(fi, fv, l, r, adj)
  }
}

package graft.cv

/** Pure-Scala CV math operators — the reference's per-record algorithmic
  * kernel, re-implemented from its observable semantics (SURVEY §2 T1/T2,
  * P9/P10, J2, A2-A4). All functions are deterministic, allocation-light,
  * and run inside UDFs (per record, never distributed).
  */
object Geometry {

  /** Axis-aligned box, reference layout `(y1, y2, x1, x2)`
    * (digit_detector/region_proposal.py:59-75). */
  final case class Box(y1: Int, y2: Int, x1: Int, x2: Int) {
    def area: Long = math.max(0, y2 - y1).toLong * math.max(0, x2 - x1)
  }

  /** Intersection-over-union of two boxes
    * (digit_detector/region_proposal.py:78-122). */
  def iou(a: Box, b: Box): Double = {
    val iy = math.max(0, math.min(a.y2, b.y2) - math.max(a.y1, b.y1)).toLong
    val ix = math.max(0, math.min(a.x2, b.x2) - math.max(a.x1, b.x1)).toLong
    val inter = iy * ix
    val union = a.area + b.area - inter
    if (union <= 0) 0.0 else inter.toDouble / union
  }

  /** Greedy non-max suppression (digit_detector/detect.py:12-63; threshold
    * 0.1 in the streaming job, dl_k_to_ss.py:321): repeatedly keep the
    * highest-probability box, drop others overlapping it above `thr`.
    * Returns indices of kept boxes in descending-probability order.
    * Inherently sequential per image — per-record Scala is the idiomatic
    * Spark shape (SURVEY §2.6 T1). */
  def nms(boxes: IndexedSeq[Box], probs: IndexedSeq[Double], thr: Double): Seq[Int] = {
    require(boxes.length == probs.length)
    var order = boxes.indices.sortBy(i => (-probs(i), i)).toList
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (order.nonEmpty) {
      val best = order.head
      kept += best
      order = order.tail.filter(i => iou(boxes(best), boxes(i)) <= thr)
    }
    kept.toSeq
  }

  /** Digit composition from surviving boxes (digit_detector/detect.py:114-138):
    * keep boxes with area >= 0.97 * max area; one box → its digit; two boxes
    * → tens/units ordered by x-coordinate; anything else is ambiguous. */
  def composeDigits(boxes: Seq[Box], digits: Seq[Int]): Option[Int] = {
    if (boxes.isEmpty) return None
    val maxArea = boxes.map(_.area).max
    val big = boxes.zip(digits).filter { case (b, _) => b.area >= 0.97 * maxArea }
    big match {
      case Seq((_, d))                        => Some(d)
      case Seq((b1, d1), (b2, d2)) =>
        if (b1.x1 <= b2.x1) Some(d1 * 10 + d2) else Some(d2 * 10 + d1)
      case _                                  => None // ambiguous → dropped (P11)
    }
  }

  /** Angle at vertex `b` of the triangle (a, b, c), in degrees — the hip
    * angle from keypoint triples (dl_k_to_ss.py:253-278). */
  def angleDeg(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Double = {
    val (v1x, v1y) = (a._1 - b._1, a._2 - b._2)
    val (v2x, v2y) = (c._1 - b._1, c._2 - b._2)
    val n1 = math.hypot(v1x, v1y)
    val n2 = math.hypot(v2x, v2y)
    if (n1 == 0 || n2 == 0) return 0.0
    val cos = math.max(-1.0, math.min(1.0, (v1x * v2x + v1y * v2y) / (n1 * n2)))
    math.toDegrees(math.acos(cos))
  }

  /** Posture gate (dl_k_to_ss.py:253-278, streaming-normative per SURVEY
    * Q7): a person is processed only if BOTH hip angles are <= 110 degrees
    * (sitting/crouching posture). */
  def postureOk(hipAngle1: Double, hipAngle2: Double): Boolean =
    hipAngle1 <= 110.0 && hipAngle2 <= 110.0

  /** L1 nearest-centroid (dl_k_to_ss.py:337-344): index of the centroid
    * minimizing |r-R|+|g-G|+|b-B|; first wins ties. */
  def l1Nearest(color: (Int, Int, Int), centroids: Seq[(Int, Int, Int)]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      val d = math.abs(color._1 - c._1).toLong +
        math.abs(color._2 - c._2).toLong + math.abs(color._3 - c._3).toLong
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Per-image seeded Lloyd's k-means over RGB pixels (dl_k_to_ss.py:326-330
    * uses sklearn KMeans(5) — per-record granularity, so a pure-Scala loop,
    * NOT MLlib; SURVEY A4). Deterministic: initial centroids are the k
    * evenly-strided distinct pixels; fixed iteration count. */
  def kmeansRgb(pixels: Array[Int], k: Int, iters: Int = 10): (Array[(Double, Double, Double)], Array[Int]) = {
    require(pixels.nonEmpty && k > 0)
    val pts = pixels.map(p => ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff))
    val distinct = pts.distinct
    val kk = math.min(k, distinct.length)
    val cent = Array.tabulate(kk) { i =>
      val p = distinct((i.toLong * distinct.length / kk).toInt)
      (p._1.toDouble, p._2.toDouble, p._3.toDouble)
    }
    val assign = new Array[Int](pts.length)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < pts.length) {
        var best = 0; var bestD = Double.MaxValue; var j = 0
        while (j < kk) {
          val dr = pts(i)._1 - cent(j)._1
          val dg = pts(i)._2 - cent(j)._2
          val db = pts(i)._3 - cent(j)._3
          val d = dr * dr + dg * dg + db * db
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)((0.0, 0.0, 0.0, 0L))
      i = 0
      while (i < pts.length) {
        val j = assign(i)
        val (r, g, b, n) = sums(j)
        sums(j) = (r + pts(i)._1, g + pts(i)._2, b + pts(i)._3, n + 1)
        i += 1
      }
      var j = 0
      while (j < kk) {
        val (r, g, b, n) = sums(j)
        if (n > 0) cent(j) = (r / n, g / n, b / n)
        j += 1
      }
      it += 1
    }
    (cent, assign)
  }

  /** Histogram of cluster labels normalized to sum 1 (color/utils.py:6-17)
    * and its arg-max → dominant cluster (dl_k_to_ss.py:332-336). */
  def dominantLabel(assign: Array[Int], k: Int): Int = {
    val hist = new Array[Int](k)
    assign.foreach(a => hist(a) += 1)
    var best = 0; var i = 1
    while (i < k) { if (hist(i) > hist(best)) best = i; i += 1 }
    best
  }
}

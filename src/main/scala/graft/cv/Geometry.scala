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
    // primitive arrays throughout: this runs per RECORD inside the UDF hot
    // loop, where boxed tuples per pixel per iteration dominate the cost
    val distinct = pixels.distinct // packed RGB ↔ tuple distinct: same set+order
    val kk = math.min(k, distinct.length)
    val cr = new Array[Double](kk); val cg = new Array[Double](kk); val cb = new Array[Double](kk)
    var j = 0
    while (j < kk) {
      val p = distinct((j.toLong * distinct.length / kk).toInt)
      cr(j) = (p >> 16) & 0xff; cg(j) = (p >> 8) & 0xff; cb(j) = p & 0xff
      j += 1
    }
    val assign = new Array[Int](pixels.length)
    val sr = new Array[Double](kk); val sg = new Array[Double](kk)
    val sb = new Array[Double](kk); val sn = new Array[Long](kk)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      java.util.Arrays.fill(sr, 0.0); java.util.Arrays.fill(sg, 0.0)
      java.util.Arrays.fill(sb, 0.0); java.util.Arrays.fill(sn, 0L)
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        var best = 0; var bestD = Double.MaxValue
        j = 0
        while (j < kk) {
          val dr = r - cr(j); val dg = g - cg(j); val db = b - cb(j)
          val d = dr * dr + dg * dg + db * db
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(i) = best
        sr(best) += r; sg(best) += g; sb(best) += b; sn(best) += 1
        i += 1
      }
      converged = true // early exit at the fixed point: same result, fewer passes
      j = 0
      while (j < kk) {
        if (sn(j) > 0) {
          val nr = sr(j) / sn(j); val ng = sg(j) / sn(j); val nb = sb(j) / sn(j)
          if (nr != cr(j) || ng != cg(j) || nb != cb(j)) converged = false
          cr(j) = nr; cg(j) = ng; cb(j) = nb
        }
        j += 1
      }
      it += 1
    }
    (Array.tabulate(kk)(j => (cr(j), cg(j), cb(j))), assign)
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

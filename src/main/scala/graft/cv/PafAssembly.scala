package graft.cv

import graft.cv.PlayerIdent.Person

/** M9/T3/M10 — Part-Affinity-Field limb scoring and greedy person assembly:
  * the pure math of the reference's multi-person pose grouping
  * (dl_k_to_ss.py:133-242), re-derived from its observable semantics. This
  * needs NO CNN weights: inputs are the per-channel keypoint peaks and the
  * 38-channel PAF field, both produced upstream (by the `HeatmapCnn` seam in
  * production, by fixtures in tests).
  *
  *  - M9 (dl_k_to_ss.py:133-173): for every candidate limb (peak A, peak B)
  *    a 10-point line integral of the PAF unit-projection along A→B, plus a
  *    distance prior `min(0.5·h/|AB| − 1, 0)`; kept only if >80% of samples
  *    clear thre2 AND the prior-adjusted mean is positive.
  *  - T3 (dl_k_to_ss.py:175-182): candidates sorted by descending score,
  *    matched greedily with endpoint uniqueness, at most min(nA,nB) limbs.
  *  - M10 (dl_k_to_ss.py:189-242): limbs folded into person rows — extend a
  *    row sharing an endpoint, merge two rows if their part sets are
  *    disjoint, else extend the first; new rows only for limbs 0..16; drop
  *    rows with <4 parts or mean score <0.4.
  */
object PafAssembly {

  /** Limb k connects 1-based part indices limbSeq(k) (dl_k_to_ss.py:32-34). */
  val limbSeq: IndexedSeq[(Int, Int)] = IndexedSeq(
    (2, 3), (2, 6), (3, 4), (4, 5), (6, 7), (7, 8), (2, 9), (9, 10),
    (10, 11), (2, 12), (12, 13), (13, 14), (2, 1), (1, 15), (15, 17),
    (1, 16), (16, 18), (3, 17), (6, 18))

  /** Limb k reads PAF channels pafIdx(k) = (x-channel, y-channel), 0-based
    * into the 38-channel field (dl_k_to_ss.py:37-39 mapIdx, shifted by the
    * 19 heatmap channels: mapIdx − 19). */
  val pafIdx: IndexedSeq[(Int, Int)] = IndexedSeq(
    (31, 32), (39, 40), (33, 34), (35, 36), (41, 42), (43, 44), (19, 20),
    (21, 22), (23, 24), (25, 26), (27, 28), (29, 30), (47, 48), (49, 50),
    (53, 54), (51, 52), (55, 56), (37, 38), (45, 46)).map(p => (p._1 - 19, p._2 - 19))

  val MidNum = 10 // line-integral sample count (dl_k_to_ss.py:135)

  /** One peak with its global candidate id (the reference's peak_counter
    * numbering: channel-major, then detection order). */
  final case class PeakId(x: Int, y: Int, score: Double, id: Int)

  /** One accepted limb: global ids of its endpoints + the PAF score. */
  final case class Connection(idA: Int, idB: Int, score: Double)

  /** Assign global ids channel-major (dl_k_to_ss.py:107-131 peak_counter). */
  def withIds(peaksPerChannel: Seq[Seq[Heatmaps.Peak]]): IndexedSeq[IndexedSeq[PeakId]] = {
    var counter = 0
    peaksPerChannel.map { ps =>
      ps.map { p =>
        val pk = PeakId(p.x, p.y, p.score.toDouble, counter)
        counter += 1
        pk
      }.toIndexedSeq
    }.toIndexedSeq
  }

  /** M9 + T3 for one limb: score all (A,B) candidates by the PAF line
    * integral, then greedy-match desc-score with endpoint uniqueness. */
  def limbConnections(candA: IndexedSeq[PeakId], candB: IndexedSeq[PeakId],
      pafX: Array[Float], pafY: Array[Float], w: Int, h: Int,
      thre2: Double): IndexedSeq[Connection] = {
    if (candA.isEmpty || candB.isEmpty) return IndexedSeq.empty
    // (iA, iB, score, rank-preserving order) candidates passing both criteria
    val cands = for {
      i <- candA.indices
      j <- candB.indices
      a = candA(i); b = candB(j)
      dx = b.x - a.x; dy = b.y - a.y
      norm = math.sqrt(dx.toDouble * dx + dy.toDouble * dy)
      if norm != 0.0 // overlapping parts: no direction (dl_k_to_ss.py:151)
      score <- {
        val (vx, vy) = (dx / norm, dy / norm)
        // 10-point inclusive linspace along A→B; sample the PAF at the
        // rounded pixel (numpy round = half-to-even) and project on (vx,vy)
        var sum = 0.0
        var above = 0
        var s = 0
        while (s < MidNum) {
          val t = s.toDouble / (MidNum - 1)
          val px = clamp(math.rint(a.x + t * dx).toInt, 0, w - 1)
          val py = clamp(math.rint(a.y + t * dy).toInt, 0, h - 1)
          val proj = pafX(py * w + px) * vx + pafY(py * w + px) * vy
          sum += proj
          if (proj > thre2) above += 1
          s += 1
        }
        val prior = math.min(0.5 * h / norm - 1.0, 0.0)
        val score = sum / MidNum + prior
        // criterion1: >80% of samples above thre2; criterion2: score > 0
        if (above > 0.8 * MidNum && score > 0) Some(score) else None
      }
    } yield (i, j, score)
    // T3: desc score (stable), greedy with endpoint uniqueness, capped at
    // min(nA, nB) limbs (dl_k_to_ss.py:175-182)
    val usedA = new Array[Boolean](candA.length)
    val usedB = new Array[Boolean](candB.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[Connection]
    val cap = math.min(candA.length, candB.length)
    cands.sortBy(-_._3).foreach { case (i, j, s) =>
      if (out.length < cap && !usedA(i) && !usedB(j)) {
        usedA(i) = true; usedB(j) = true
        out += Connection(candA(i).id, candB(j).id, s)
      }
    }
    out.toIndexedSeq
  }

  private def clamp(v: Int, lo: Int, hi: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Person row under assembly: 18 part slots holding global candidate ids
    * (−1 = empty) + running score + part count — the reference's 20-wide
    * subset rows (dl_k_to_ss.py:191). */
  private final class Row {
    val parts: Array[Int] = Array.fill(18)(-1)
    var score: Double = 0.0
    var count: Int = 0
  }

  /** M10: fold per-limb connections into persons (dl_k_to_ss.py:194-242). */
  def assemble(peaksPerChannel: IndexedSeq[IndexedSeq[PeakId]],
      paf: Array[Array[Float]], w: Int, h: Int,
      thre2: Double = 0.05): Seq[Person] = {
    require(paf.length == 38, s"PAF field must have 38 channels, got ${paf.length}")
    val candidate = peaksPerChannel.flatten // global-id order by construction
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]

    for (k <- limbSeq.indices) {
      val (a1, b1) = limbSeq(k)
      val (px, py) = pafIdx(k)
      val conns = limbConnections(
        peaksPerChannel(a1 - 1), peaksPerChannel(b1 - 1),
        paf(px), paf(py), w, h, thre2)
      val (idxA, idxB) = (a1 - 1, b1 - 1)
      conns.foreach { c =>
        // find up to two rows already holding either endpoint
        val hits = rows.zipWithIndex.collect {
          case (r, j) if r.parts(idxA) == c.idA || r.parts(idxB) == c.idB => j
        }.take(2)
        hits.length match {
          case 1 =>
            val r = rows(hits.head)
            if (r.parts(idxB) != c.idB) {
              r.parts(idxB) = c.idB
              r.count += 1
              r.score += candidate(c.idB).score + c.score
            }
          case 2 =>
            val (r1, r2) = (rows(hits.head), rows(hits(1)))
            val overlap = (0 until 18).exists(i => r1.parts(i) >= 0 && r2.parts(i) >= 0)
            if (!overlap) { // merge-if-disjoint (dl_k_to_ss.py:214-221)
              var i = 0
              while (i < 18) {
                if (r2.parts(i) >= 0) r1.parts(i) = r2.parts(i)
                i += 1
              }
              r1.count += r2.count
              r1.score += r2.score + c.score
              rows.remove(hits(1))
            } else { // overlapping part sets: extend the first like found==1
              r1.parts(idxB) = c.idB
              r1.count += 1
              r1.score += candidate(c.idB).score + c.score
            }
          case _ if k < 17 => // new person rows only for the 17 body limbs
            val r = new Row
            r.parts(idxA) = c.idA
            r.parts(idxB) = c.idB
            r.count = 2
            r.score = candidate(c.idA).score + candidate(c.idB).score + c.score
            rows += r
          case _ => // k = 17, 18 (ear-shoulder): never seed a new person
        }
      }
    }

    // P9 drop rule: <4 parts or mean score <0.4 (dl_k_to_ss.py:237-242)
    rows.toSeq
      .filter(r => r.count >= 4 && r.score / r.count >= 0.4)
      .map { r =>
        Person(Array.tabulate(18) { c =>
          val id = r.parts(c)
          if (id < 0) None
          else {
            val p = candidate(id)
            Some((p.x.toDouble, p.y.toDouble, p.score))
          }
        })
      }
  }
}

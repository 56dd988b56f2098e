package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cv.Geometry._

class GeometrySpec extends AnyFunSuite {

  test("iou: identical boxes → 1, disjoint → 0, half overlap") {
    val a = Box(0, 10, 0, 10)
    assert(iou(a, a) == 1.0)
    assert(iou(a, Box(20, 30, 20, 30)) == 0.0)
    // [0,10)x[0,10) vs [0,10)x[5,15): inter 50, union 150
    assert(math.abs(iou(a, Box(0, 10, 5, 15)) - 50.0 / 150.0) < 1e-12)
  }

  test("nms keeps highest-prob box and suppresses overlaps above threshold") {
    val boxes = IndexedSeq(
      Box(0, 10, 0, 10),   // best
      Box(1, 11, 1, 11),   // heavy overlap with 0 → suppressed
      Box(0, 10, 20, 30))  // disjoint → kept
    val probs = IndexedSeq(0.9, 0.8, 0.7)
    assert(nms(boxes, probs, 0.1) == Seq(0, 2))
    // threshold 1.0 → nothing suppressed
    assert(nms(boxes, probs, 1.0).sorted == Seq(0, 1, 2))
  }

  test("nms is deterministic under probability ties (index order)") {
    val boxes = IndexedSeq(Box(0, 10, 0, 10), Box(0, 10, 40, 50))
    assert(nms(boxes, IndexedSeq(0.5, 0.5), 0.1) == Seq(0, 1))
  }

  test("digit composition: 1 box → digit, 2 boxes → x-ordered tens/units") {
    assert(composeDigits(Seq(Box(0, 10, 5, 9)), Seq(7)) == Some(7))
    // right box listed first; x-order must give 3*10 + 9 = 39
    assert(composeDigits(
      Seq(Box(0, 10, 12, 20), Box(0, 10, 2, 10)), Seq(9, 3)) == Some(39))
    // 3 near-max-area boxes → ambiguous
    assert(composeDigits(
      Seq(Box(0, 10, 0, 8), Box(0, 10, 10, 18), Box(0, 10, 20, 28)),
      Seq(1, 2, 3)).isEmpty)
    // small third box is ignored (area < 0.97 max)
    assert(composeDigits(
      Seq(Box(0, 10, 0, 8), Box(0, 10, 10, 18), Box(0, 2, 20, 22)),
      Seq(1, 2, 3)) == Some(12))
    assert(composeDigits(Nil, Nil).isEmpty)
  }

  test("hip angle: straight line → 180°, right angle → 90°; posture gate at 110°") {
    assert(math.abs(angleDeg((0, 0), (0, 5), (0, 10)) - 180.0) < 1e-9)
    assert(math.abs(angleDeg((0, 0), (0, 5), (5, 5)) - 90.0) < 1e-9)
    assert(postureOk(90, 100))
    assert(!postureOk(90, 111)) // one standing hip fails the gate
  }

  test("l1 nearest centroid matches reference jersey-color semantics") {
    val teams = Seq((245, 232, 230), (27, 48, 157))
    assert(l1Nearest((240, 230, 225), teams) == 0)
    assert(l1Nearest((30, 50, 150), teams) == 1)
    assert(l1Nearest((0, 0, 0), Seq((0, 0, 0), (0, 0, 0))) == 0) // tie → first
  }

  test("kmeans: two well-separated colors recovered; deterministic") {
    val dark = 0x101010
    val light = 0xf0f0f0
    val px = Array.fill(60)(dark) ++ Array.fill(40)(light)
    val (c1, a1) = kmeansRgb(px, 2)
    val (c2, a2) = kmeansRgb(px, 2)
    assert(c1.toSeq == c2.toSeq && a1.toSeq == a2.toSeq) // deterministic
    val dom = c1(dominantLabel(a1, c1.length))
    assert(dom._1.round == 0x10 && dom._2.round == 0x10) // dark dominates 60/40
  }

  test("kmeans handles fewer distinct colors than k") {
    val px = Array.fill(10)(0xabcdef)
    val (cent, assign) = kmeansRgb(px, 5)
    assert(cent.length == 1 && assign.forall(_ == 0))
  }
}

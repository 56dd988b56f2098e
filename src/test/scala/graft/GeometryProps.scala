package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.cv.Geometry._

/** Property-based invariants for the pure-Scala CV kernel (SURVEY §5 test
  * plan item 4). */
object GeometryProps extends Properties("Geometry") {

  val genBox: Gen[Box] = for {
    y1 <- Gen.choose(0, 80); h <- Gen.choose(1, 40)
    x1 <- Gen.choose(0, 80); w <- Gen.choose(1, 40)
  } yield Box(y1, y1 + h, x1, x1 + w)

  val genBoxes: Gen[(IndexedSeq[Box], IndexedSeq[Double])] = for {
    n <- Gen.choose(0, 12)
    boxes <- Gen.listOfN(n, genBox)
    probs <- Gen.listOfN(n, Gen.choose(0.0, 1.0))
  } yield (boxes.toIndexedSeq, probs.toIndexedSeq)

  property("iou symmetric and in [0,1]") = forAll(genBox, genBox) { (a, b) =>
    val ab = iou(a, b)
    ab == iou(b, a) && ab >= 0.0 && ab <= 1.0 && iou(a, a) == 1.0
  }

  property("nms: kept indices valid, unique, mutually non-overlapping above thr") =
    forAll(genBoxes, Gen.choose(0.05, 0.9)) { case ((boxes, probs), thr) =>
      val kept = nms(boxes, probs, thr)
      val validIdx = kept.forall(boxes.indices.contains) && kept.distinct == kept
      val pairwiseOk = kept.combinations(2).forall {
        case Seq(i, j) => iou(boxes(i), boxes(j)) <= thr
        case _ => true
      }
      validIdx && pairwiseOk
    }

  property("nms: every dropped box overlaps a kept box above thr") =
    forAll(genBoxes, Gen.choose(0.05, 0.9)) { case ((boxes, probs), thr) =>
      val kept = nms(boxes, probs, thr).toSet
      boxes.indices.filterNot(kept).forall(i =>
        kept.exists(k => iou(boxes(k), boxes(i)) > thr))
    }

  property("nms idempotent on its own output") =
    forAll(genBoxes, Gen.choose(0.05, 0.9)) { case ((boxes, probs), thr) =>
      val kept = nms(boxes, probs, thr)
      val b2 = kept.map(boxes).toIndexedSeq
      val p2 = kept.map(probs).toIndexedSeq
      nms(b2, p2, thr).length == b2.length
    }

  property("angle in [0,180]") =
    forAll(Gen.choose(-50.0, 50.0), Gen.choose(-50.0, 50.0),
           Gen.choose(-50.0, 50.0), Gen.choose(-50.0, 50.0),
           Gen.choose(-50.0, 50.0), Gen.choose(-50.0, 50.0)) { (ax, ay, bx, by, cx, cy) =>
      val d = angleDeg((ax, ay), (bx, by), (cx, cy))
      d >= 0.0 && d <= 180.0
    }

  property("l1Nearest returns the index with minimal distance (totality)") =
    forAll(Gen.nonEmptyListOf(for {
      r <- Gen.choose(0, 255); g <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    } yield (r, g, b)), Gen.choose(0, 255), Gen.choose(0, 255), Gen.choose(0, 255)) {
      (cents, r, g, b) =>
        val idx = l1Nearest((r, g, b), cents)
        val d = (c: (Int, Int, Int)) =>
          math.abs(r - c._1) + math.abs(g - c._2) + math.abs(b - c._3)
        cents.indices.contains(idx) && cents.forall(c => d(cents(idx)) <= d(c))
    }

  property("composeDigits total: never throws, two-box result uses x order") =
    forAll(genBox, genBox, Gen.choose(0, 9), Gen.choose(0, 9)) { (b1, b2, d1, d2) =>
      Prop.secure {
        composeDigits(Seq(b1, b2), Seq(d1, d2)) match {
          case Some(v) if v >= 10 =>
            val (tl, ul) = if (b1.x1 <= b2.x1) (d1, d2) else (d2, d1)
            v == tl * 10 + ul
          case Some(v) => Seq(d1, d2).contains(v) // one box below area cutoff
          case None => true
        }
      }
    }

  property("kmeans deterministic and assignment indices valid") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 0xffffff)), Gen.choose(1, 5)) { (px, k) =>
      val arr = px.toArray
      val (c1, a1) = kmeansRgb(arr, k)
      val (c2, a2) = kmeansRgb(arr, k)
      c1.toSeq == c2.toSeq && a1.toSeq == a2.toSeq &&
        a1.forall(i => i >= 0 && i < c1.length)
    }
}

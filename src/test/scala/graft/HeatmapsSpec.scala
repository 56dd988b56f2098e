package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cv.Heatmaps._
import graft.cv.PlayerIdent.Image

class HeatmapsSpec extends AnyFunSuite {

  test("multiScaleAverage is the element-wise mean") {
    val a = Array(0f, 2f, 4f)
    val b = Array(2f, 2f, 0f)
    assert(multiScaleAverage(Seq(a, b)).toSeq == Seq(1f, 2f, 2f))
    assert(multiScaleAverage(Seq(a)).toSeq == a.toSeq)
  }

  test("gaussianBlur preserves mass of a constant field and smooths a spike") {
    val w = 11; val h = 11
    val flat = Array.fill(w * h)(0.5f)
    val bf = gaussianBlur(flat, w, h, 3.0)
    assert(bf.forall(v => math.abs(v - 0.5f) < 1e-4), "constant field must be invariant")

    val spike = new Array[Float](w * h)
    spike(5 * w + 5) = 1.0f
    val bs = gaussianBlur(spike, w, h, 1.0)
    assert(bs(5 * w + 5) < 1.0f && bs(5 * w + 5) > bs(5 * w + 6))
    assert(math.abs(bs(5 * w + 4) - bs(5 * w + 6)) < 1e-6, "symmetric around the spike")
  }

  test("detectPeaks finds isolated maxima above threshold only") {
    val w = 9; val h = 9
    val m = new Array[Float](w * h)
    m(2 * w + 2) = 0.9f  // strong peak
    m(6 * w + 6) = 0.05f // below thr=0.1 after blur — must not appear
    val peaks = detectPeaks(m, w, h, sigma = 0.5, thr = 0.1)
    assert(peaks.map(p => (p.x, p.y)) == Seq((2, 2)))
    assert(peaks.head.score == 0.9f) // scored from the raw map
  }

  test("detectPeaks separates two distinct maxima") {
    val w = 15; val h = 5
    val m = new Array[Float](w * h)
    m(2 * w + 2) = 0.8f
    m(2 * w + 12) = 0.6f
    val peaks = detectPeaks(m, w, h, sigma = 0.5, thr = 0.1)
    assert(peaks.map(p => (p.x, p.y)).toSet == Set((2, 2), (12, 2)))
  }

  test("boxDenoise removes salt noise from a constant image") {
    val img = Image(5, 5, Array.fill(25)(0x808080))
    val noisy = img.pixels.clone(); noisy(12) = 0xffffff
    val den = boxDenoise(Image(5, 5, noisy))
    val center = den.pixels(12)
    assert(((center >> 16) & 0xff) < 0x99, "spike must be averaged down")
    // constant image is (nearly) invariant
    val denFlat = boxDenoise(img)
    assert(denFlat.pixels.forall(_ == 0x808080))
  }

  test("HeatmapPoseEstimator: real A5+M8 math over a stub CNN yields ranked persons") {
    val w = 64; val h = 64
    val cnn = new HeatmapCnn {
      def heatmaps(img: Image): Array[Array[Float]] =
        Array.tabulate(18) { c =>
          val m = new Array[Float](w * h)
          m(10 * w + (5 + c)) = 0.9f      // person 0 keypoints, strongest
          m(40 * w + (5 + c)) = 0.4f      // person 1 keypoints, weaker
          m
        }
    }
    // delta-spike stub maps need a narrow blur; real CNN blobs use the σ=3 default
    val est = new HeatmapPoseEstimator(cnn, scales = Seq(0.5, 1.0), sigma = 0.5)
    val persons = est.estimate(Image(w, h, new Array[Int](w * h)))
    assert(persons.length == 2)
    // person 0 gets the stronger (y=10) peaks on every channel
    assert(persons(0).keypoints.zipWithIndex.forall {
      case (Some((x, y, s)), c) => y == 10.0 && x == 5.0 + c && s > 0.4
      case _ => false
    })
    assert(persons(1).keypoints.forall(_.exists(_._2 == 40.0)))
  }
}

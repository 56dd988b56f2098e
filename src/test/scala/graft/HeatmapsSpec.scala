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

  // ------------------------------------------------- M9/T3/M10 PAF fixtures

  import graft.cv.PafAssembly
  import graft.cv.PafAssembly.{Connection, PeakId}

  private val W = 32; private val H = 32

  private def field(set: (Array[Float], Int) => Unit): Array[Array[Float]] = {
    val paf = Array.fill(38)(new Array[Float](W * H))
    paf.indices.foreach(c => set(paf(c), c))
    paf
  }

  test("limbConnections: line-integral score matches the hand-computed value (M9)") {
    // A=(0,0) → B=(0,9): unit vec (0,1); PAF y-component 0.5 everywhere →
    // every sample projects to 0.5; prior = min(0.5·16/9 − 1, 0) = −1/9
    val w = 16; val h = 16
    val pafX = new Array[Float](w * h)
    val pafY = Array.fill(w * h)(0.5f)
    val conns = PafAssembly.limbConnections(
      IndexedSeq(PeakId(0, 0, 0.9, 0)), IndexedSeq(PeakId(0, 9, 0.8, 1)),
      pafX, pafY, w, h, thre2 = 0.05)
    assert(conns.length == 1)
    val expected = 0.5 + math.min(0.5 * h / 9.0 - 1.0, 0.0)
    assert(math.abs(conns.head.score - expected) < 1e-9,
      s"got ${conns.head.score}, want $expected")
    assert(conns.head == Connection(0, 1, conns.head.score))
  }

  test("limbConnections: 80%-above-thre2 criterion rejects patchy support (M9)") {
    // only 6 of 10 samples lie on supported pixels (y <= 5) → rejected even
    // though the mean projection is positive
    val w = 16; val h = 16
    val pafX = new Array[Float](w * h)
    val pafY = new Array[Float](w * h)
    for (y <- 0 to 5; x <- 0 until w) pafY(y * w + x) = 1.0f
    val conns = PafAssembly.limbConnections(
      IndexedSeq(PeakId(0, 0, 0.9, 0)), IndexedSeq(PeakId(0, 9, 0.8, 1)),
      pafX, pafY, w, h, thre2 = 0.05)
    assert(conns.isEmpty)
  }

  test("limbConnections: greedy desc-score matching enforces endpoint uniqueness (T3)") {
    // two As, one B: only the better-supported A keeps the B endpoint
    val w = 32; val h = 32
    val pafX = new Array[Float](w * h)
    val pafY = new Array[Float](w * h)
    for (y <- 0 until h; x <- 0 to 6) pafY(y * w + x) = 1.0f // A0's column only
    val conns = PafAssembly.limbConnections(
      IndexedSeq(PeakId(5, 5, 0.9, 0), PeakId(5, 7, 0.3, 1)),
      IndexedSeq(PeakId(5, 15, 0.8, 2)),
      pafX, pafY, w, h, thre2 = 0.05)
    // cap = min(nA, nB) = 1: exactly one connection survives, the one with
    // the higher dist-prior-adjusted score (shorter limb → both pass the
    // integral; greedy keeps the first after the desc sort)
    assert(conns.length == 1)
    assert(conns.head.idB == 2)
  }

  /** Two vertical 4-part chains (parts 2→3→4→5 at x=5 and x=20) whose
    * per-channel score ORDER disagrees — rank-based assembly would pair
    * the left person's head with the right person's torso. */
  private def twoPersonFixture(): (IndexedSeq[IndexedSeq[PeakId]], Array[Array[Float]]) = {
    val peaks = Array.fill(18)(IndexedSeq.empty[PeakId])
    // scores: left stronger on parts 2 and 4, right stronger on parts 3 and 5
    peaks(1) = IndexedSeq(PeakId(5, 5, 0.9, 0), PeakId(20, 5, 0.8, 1))   // part 2
    peaks(2) = IndexedSeq(PeakId(5, 10, 0.7, 2), PeakId(20, 10, 0.95, 3)) // part 3
    peaks(3) = IndexedSeq(PeakId(5, 15, 0.9, 4), PeakId(20, 15, 0.8, 5)) // part 4
    peaks(4) = IndexedSeq(PeakId(5, 20, 0.6, 6), PeakId(20, 20, 0.9, 7)) // part 5
    // vertical PAF support only on each person's own column band: limbs
    // k=0 [2,3], k=2 [3,4], k=3 [4,5] → y-channels 13, 15, 17
    val paf = field { (m, c) =>
      if (c == 13 || c == 15 || c == 17)
        for (y <- 0 until H; x <- Seq(4, 5, 6, 19, 20, 21)) m(y * W + x) = 1.0f
    }
    (peaks.toIndexedSeq, paf)
  }

  test("PAF assembly groups two persons geometrically, not by score rank (M10)") {
    val (peaks, paf) = twoPersonFixture()
    val persons = PafAssembly.assemble(peaks, paf, W, H)
    assert(persons.length == 2)
    val left = persons.find(_.keypoints(1).exists(_._1 == 5.0)).get
    val right = persons.find(_.keypoints(1).exists(_._1 == 20.0)).get
    // every keypoint of each person sits on its own column — in particular
    // part 3, where the RIGHT person has the higher score (0.95 vs 0.7):
    // rank-k assembly would have put (20,10,0.95) into the left person
    assert(left.keypoints.slice(1, 5).toSeq ==
      Seq(Some((5.0, 5.0, 0.9)), Some((5.0, 10.0, 0.7)),
        Some((5.0, 15.0, 0.9)), Some((5.0, 20.0, 0.6))))
    assert(right.keypoints.slice(1, 5).toSeq ==
      Seq(Some((20.0, 5.0, 0.8)), Some((20.0, 10.0, 0.95)),
        Some((20.0, 15.0, 0.8)), Some((20.0, 20.0, 0.9))))
    assert(left.keypoints.zipWithIndex.forall { case (kp, c) =>
      if (c >= 1 && c <= 4) kp.isDefined else kp.isEmpty })
  }

  test("PAF assembly drops configurations with fewer than 4 parts (P9 drop rule)") {
    val (peaks, paf) = twoPersonFixture()
    // remove parts 4 and 5 → each person has only the 2-part limb k=0
    val trimmed = peaks.updated(3, IndexedSeq.empty[PeakId])
      .updated(4, IndexedSeq.empty[PeakId])
    assert(PafAssembly.assemble(trimmed, paf, W, H).isEmpty)
  }

  test("PAF assembly merges two disjoint part-chains joined by a later limb (M10 merge)") {
    // row 1 from limb k=0 [2,3] at x=5; row 2 from limbs k=13 [1,15] and
    // k=14 [15,17] at x=20; limb k=17 [3,17] (which may never CREATE a row)
    // bridges them → one person with 5 parts
    val peaks = Array.fill(18)(IndexedSeq.empty[PeakId])
    peaks(1) = IndexedSeq(PeakId(5, 5, 0.9, 0))    // part 2
    peaks(2) = IndexedSeq(PeakId(5, 10, 0.9, 1))   // part 3
    peaks(0) = IndexedSeq(PeakId(20, 5, 0.9, 2))   // part 1
    peaks(14) = IndexedSeq(PeakId(20, 10, 0.9, 3)) // part 15
    peaks(16) = IndexedSeq(PeakId(20, 15, 0.9, 4)) // part 17
    val paf = field { (m, c) =>
      // vertical support for k=0 (y-ch 13), k=13 (y-ch 31), k=14 (y-ch 35)
      if (c == 13 || c == 31 || c == 35) java.util.Arrays.fill(m, 1.0f)
      // horizontal-ish support for the bridge k=17 (x-ch 18)
      if (c == 18) java.util.Arrays.fill(m, 1.0f)
    }
    val persons = PafAssembly.assemble(peaks.toIndexedSeq, paf, W, H)
    assert(persons.length == 1)
    val defined = persons.head.keypoints.zipWithIndex.collect {
      case (Some(_), c) => c }.toSet
    assert(defined == Set(0, 1, 2, 14, 16))
  }

  // --------------------------------------------------- M7 multi-scale + seam

  /** CNN stub whose output depends on the input resolution — multi-scale
    * passes must produce genuinely different per-scale fields. */
  private class SizeProbeCnn extends HeatmapCnn {
    def heatmaps(img: Image): Array[Array[Float]] =
      Array.fill(18)(Array.fill(img.w * img.h)(img.w.toFloat))
    def pafs(img: Image): Array[Array[Float]] =
      Array.fill(38)(Array.fill(img.w * img.h)(img.w.toFloat))
  }

  test("multi-scale inference genuinely varies scale and averages (M7 + A5)") {
    val img = Image(W, H, new Array[Int](W * H))
    val half = new HeatmapPoseEstimator(new SizeProbeCnn, scales = Seq(0.5))
    val full = new HeatmapPoseEstimator(new SizeProbeCnn, scales = Seq(1.0))
    val both = new HeatmapPoseEstimator(new SizeProbeCnn, scales = Seq(0.5, 1.0))
    val h05 = half.averagedFields(img)._1(0)
    val h10 = full.averagedFields(img)._1(0)
    val hAvg = both.averagedFields(img)._1(0)
    // 0.5-scale pass runs the CNN on a 16×16 image (probe emits 16), the
    // 1.0 pass on 32×32 (emits 32) — the per-scale fields must differ and
    // the multi-scale result must be their element-wise mean
    assert(h05.forall(v => math.abs(v - 16f) < 1e-3))
    assert(h10.forall(v => math.abs(v - 32f) < 1e-3))
    assert(hAvg.forall(v => math.abs(v - 24f) < 1e-3))
  }

  test("bicubic image resize + pad-to-stride (M7 pre-steps)") {
    // constant image is invariant under bicubic resampling
    val flat = Image(20, 12, Array.fill(240)(0x406080))
    val up = resizeBicubic(flat, 40, 24)
    assert(up.w == 40 && up.h == 24)
    assert(up.pixels.forall(_ == 0x406080))
    // linear ramp is reproduced exactly by cubic interpolation (interior)
    val rampW = 16
    val ramp = Array.tabulate[Float](rampW * 4)(i => (i % rampW).toFloat)
    val up2 = resizeMapBicubic(ramp, rampW, 4, rampW * 2, 8)
    val mid = up2(4 * rampW * 2 + 15) // interior sample at x=15 → src x≈7.25
    assert(math.abs(mid - 7.25f) < 0.05, s"ramp midpoint $mid")
    // pad: 30×30 at stride 8 → 32×32, constant 128 fill rows/cols
    val (padded, pd, pr) = padRightDown(Image(30, 30, Array.fill(900)(0)), 8, 128)
    assert(pd == 2 && pr == 2 && padded.w == 32 && padded.h == 32)
    assert(padded.pixels(31) == 0x808080 && padded.pixels(31 * 32) == 0x808080)
    assert(padded.pixels(0) == 0)
  }

  test("HeatmapPoseEstimator end-to-end: peaks → PAF assembly over the CNN seam") {
    val (peaksFixture, pafFixture) = twoPersonFixture()
    val cnn = new HeatmapCnn {
      def heatmaps(img: Image): Array[Array[Float]] =
        Array.tabulate(18) { c =>
          val m = new Array[Float](img.w * img.h)
          peaksFixture(c).foreach(p => m(p.y * img.w + p.x) = p.score.toFloat)
          m
        }
      def pafs(img: Image): Array[Array[Float]] = pafFixture
    }
    // spike maps need a narrow blur; real CNN blobs use the σ=3 default
    val est = new HeatmapPoseEstimator(cnn, scales = Seq(1.0), sigma = 0.5)
    val persons = est.estimate(Image(W, H, new Array[Int](W * H)))
    assert(persons.length == 2)
    assert(persons.forall(_.keypoints.slice(1, 5).forall(_.isDefined)))
    val xs = persons.map(_.keypoints(1).get._1).sorted
    assert(xs == Seq(5.0, 20.0))
  }
}

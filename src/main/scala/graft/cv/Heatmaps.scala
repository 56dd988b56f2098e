package graft.cv

import graft.cv.PlayerIdent.{Image, Person, PoseEstimator}

/** Pure-Scala heatmap math of the pose pipeline — the parts of the
  * reference's OpenPose stage that are real algorithms rather than CNN
  * weights: bicubic multi-scale resize + pad-to-stride (M7,
  * dl_k_to_ss.py:79-102), multi-scale accumulation (A5, :76-77,104-105),
  * gaussian smoothing + 4-neighbor local-max peak detection with threshold
  * 0.1 (M8, :107-131), and denoising (M12). Limb matching / person
  * assembly (M9/T3/M10) lives in `PafAssembly`. Only the CNN forward pass
  * itself remains a pluggable seam (`HeatmapCnn`).
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

  /** Normalized gaussian kernel, truncated at 3σ — the ONE definition
    * shared by [[gaussianBlur]] and the `cv_pose_peaks` oracle SQL
    * generator (which embeds these exact doubles as literals so the
    * DuckDB replay multiplies the same bits). */
  private[graft] def gaussKernel(sigma: Double): Array[Double] = {
    val radius = math.max(1, math.ceil(3 * sigma).toInt)
    val kernel = Array.tabulate(2 * radius + 1) { i =>
      val x = i - radius
      math.exp(-x * x / (2 * sigma * sigma))
    }
    val ksum = kernel.sum
    var i = 0
    while (i < kernel.length) { kernel(i) /= ksum; i += 1 }
    kernel
  }

  /** Separable gaussian blur, truncated at 3σ (M8 prereq; the reference
    * uses scipy gaussian_filter with σ=3). Edges clamp (nearest). */
  def gaussianBlur(map: Array[Float], w: Int, h: Int, sigma: Double): Array[Float] = {
    require(map.length == w * h)
    val kernel = gaussKernel(sigma)
    val radius = kernel.length / 2

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

  // ------------------------------------------------------ bicubic resample

  /** Cubic convolution kernel, OpenCV INTER_CUBIC's A = −0.75. */
  private def cubicWeight(x: Double): Double = {
    val a = -0.75
    val ax = math.abs(x)
    if (ax <= 1.0) (a + 2.0) * ax * ax * ax - (a + 3.0) * ax * ax + 1.0
    else if (ax < 2.0) a * ax * ax * ax - 5.0 * a * ax * ax + 8.0 * a * ax - 4.0 * a
    else 0.0
  }

  /** Bicubic resample of a scalar field (edge-clamped taps, OpenCV's
    * half-pixel-center coordinate mapping src = (dst+0.5)/scale − 0.5). */
  private def resampleBicubic(get: (Int, Int) => Double, w: Int, h: Int,
      outW: Int, outH: Int): Array[Double] = {
    val out = new Array[Double](outW * outH)
    val sx = w.toDouble / outW
    val sy = h.toDouble / outH
    var oy = 0
    while (oy < outH) {
      val fy = (oy + 0.5) * sy - 0.5
      val y0 = math.floor(fy).toInt
      var ox = 0
      while (ox < outW) {
        val fx = (ox + 0.5) * sx - 0.5
        val x0 = math.floor(fx).toInt
        var acc = 0.0
        var wsum = 0.0
        var ky = -1
        while (ky <= 2) {
          val yy = math.min(h - 1, math.max(0, y0 + ky))
          val wy = cubicWeight(fy - (y0 + ky))
          var kx = -1
          while (kx <= 2) {
            val xx = math.min(w - 1, math.max(0, x0 + kx))
            val wgt = wy * cubicWeight(fx - (x0 + kx))
            acc += get(xx, yy) * wgt
            wsum += wgt
            kx += 1
          }
          ky += 1
        }
        out(oy * outW + ox) = acc / wsum
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Bicubic image resize (M7 pre-step; cv2.resize INTER_CUBIC at
    * dl_k_to_ss.py:82). Per-RGB-channel, clamped to [0,255]. */
  def resizeBicubic(img: Image, outW: Int, outH: Int): Image = {
    if (outW == img.w && outH == img.h) return img
    def chan(shift: Int) = resampleBicubic(
      (x, y) => (img.pixels(y * img.w + x) >> shift) & 0xff, img.w, img.h, outW, outH)
    val (r, g, b) = (chan(16), chan(8), chan(0))
    val px = Array.tabulate(outW * outH) { i =>
      def c8(v: Double) = math.min(255, math.max(0, math.round(v).toInt))
      (c8(r(i)) << 16) | (c8(g(i)) << 8) | c8(b(i))
    }
    Image(outW, outH, px)
  }

  /** Bicubic resize of one float heatmap/PAF channel (dl_k_to_ss.py:96). */
  def resizeMapBicubic(map: Array[Float], w: Int, h: Int,
      outW: Int, outH: Int): Array[Float] = {
    require(map.length == w * h)
    if (outW == w && outH == h) return map
    resampleBicubic((x, y) => map(y * w + x), w, h, outW, outH).map(_.toFloat)
  }

  /** Pad bottom/right to a multiple of `stride` with constant `padValue`
    * (openpose/util.py:57-77 padRightDownCorner; only down/right pad is
    * ever non-zero there). Returns (padded, padDown, padRight). */
  def padRightDown(img: Image, stride: Int, padValue: Int): (Image, Int, Int) = {
    val padDown = if (img.h % stride == 0) 0 else stride - (img.h % stride)
    val padRight = if (img.w % stride == 0) 0 else stride - (img.w % stride)
    if (padDown == 0 && padRight == 0) return (img, 0, 0)
    val w2 = img.w + padRight
    val h2 = img.h + padDown
    val fill = ((padValue & 0xff) << 16) | ((padValue & 0xff) << 8) | (padValue & 0xff)
    val px = Array.fill(w2 * h2)(fill)
    var y = 0
    while (y < img.h) {
      System.arraycopy(img.pixels, y * img.w, px, y * w2, img.w)
      y += 1
    }
    (Image(w2, h2, px), padDown, padRight)
  }

  /** The remaining CNN seam: image → 18 keypoint heatmaps AND the
    * 38-channel part-affinity field, each channel img.w×img.h row-major
    * (the reference model's two output blobs, dl_k_to_ss.py:91-98; the
    * stride-8 internal resolution and ×stride upsample live inside the
    * model, so the seam contract is input-resolution maps). */
  trait HeatmapCnn extends Serializable {
    def heatmaps(img: Image): Array[Array[Float]]
    def pafs(img: Image): Array[Array[Float]]
  }

  /** Pose estimator from the REAL pose math over a pluggable CNN
    * (dl_k_to_ss.py:71-242): per scale, bicubic-resize the image and pad
    * to the model stride (M7), run the CNN, crop the padding and resize
    * each channel back to the original size, then average across scales
    * (A5); peak-detect per channel (M8); group keypoints into persons via
    * PAF line-integral limb scoring + greedy assembly (M9/T3/M10). */
  final class HeatmapPoseEstimator(cnn: HeatmapCnn, scales: Seq[Double] = Seq(1.0),
      sigma: Double = 3.0, thr: Double = 0.1, thre2: Double = 0.05,
      stride: Int = 8, padValue: Int = 128)
      extends PoseEstimator {

    /** One scale pass: resize → pad → CNN → crop pad → resize back
      * (dl_k_to_ss.py:79-102). */
    private def atScale(img: Image, scale: Double,
        run: Image => Array[Array[Float]]): Array[Array[Float]] = {
      val sw = math.max(1, math.round(img.w * scale).toInt)
      val sh = math.max(1, math.round(img.h * scale).toInt)
      val scaled = resizeBicubic(img, sw, sh)
      val (padded, padDown, padRight) = padRightDown(scaled, stride, padValue)
      run(padded).map { m =>
        require(m.length == padded.w * padded.h,
          s"CNN must emit input-sized channels (${padded.w}x${padded.h})")
        val cropped =
          if (padDown == 0 && padRight == 0) m
          else Array.tabulate(sw * sh)(i => m((i / sw) * padded.w + i % sw))
        resizeMapBicubic(cropped, sw, sh, img.w, img.h)
      }
    }

    /** Scale-averaged (heatmaps, PAF field) at original resolution
      * (dl_k_to_ss.py:104-105 heatmap_avg/paf_avg). */
    def averagedFields(img: Image): (Array[Array[Float]], Array[Array[Float]]) = {
      val heatPerScale = scales.map(s => atScale(img, s, cnn.heatmaps))
      val pafPerScale = scales.map(s => atScale(img, s, cnn.pafs))
      val heatAvg = heatPerScale.head.indices.map(c =>
        multiScaleAverage(heatPerScale.map(_(c)))).toArray
      val pafAvg = pafPerScale.head.indices.map(c =>
        multiScaleAverage(pafPerScale.map(_(c)))).toArray
      (heatAvg, pafAvg)
    }

    def estimate(img: Image): Seq[Person] = {
      val (heatAvg, pafAvg) = averagedFields(img)
      val peaks = heatAvg.toIndexedSeq.map(m => detectPeaks(m, img.w, img.h, sigma, thr))
      PafAssembly.assemble(PafAssembly.withIds(peaks), pafAvg, img.w, img.h, thre2)
    }
  }
}

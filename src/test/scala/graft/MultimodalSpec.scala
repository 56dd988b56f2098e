package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.cv.PlayerIdent.Image
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("multimodal-spec", cores = 8)

  def media = {
    import spark.implicits._
    (1 to 5).map(i => Multimodal.MediaRow(i.toLong, s"payload number $i".getBytes))
      .toDS()
  }

  test("imageMeta: typed metadata per decodable payload; empty payloads dropped") {
    import spark.implicits._
    val withEmpty = media.union(Seq(Multimodal.MediaRow(99L, Array.emptyByteArray)).toDS())
    val out = Multimodal.imageMeta(withEmpty).collect().sortBy(_.id)
    assert(out.length == 5) // empty payload yields no row (None-safe decode)
    out.foreach { m =>
      assert(m.width == 64 && m.height == 64 && m.format == "stub-rgb" && m.nBytes > 0)
    }
  }

  test("imageFeatures: fixed-dim float vectors, deterministic") {
    val f1 = Multimodal.imageFeatures(media).collect().sortBy(_.id)
    val f2 = Multimodal.imageFeatures(media).collect().sortBy(_.id)
    assert(f1.length == 5)
    f1.foreach(f => assert(f.features.length == 16 && f.features.forall(v => v >= 0 && v <= 1)))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("resize: box-filter downsample preserves constant regions exactly") {
    val img = Image(8, 8, Array.fill(64)(0x336699))
    val out = Multimodal.resize(img, 4, 4)
    assert(out.w == 4 && out.h == 4)
    assert(out.pixels.forall(_ == 0x336699))
    // non-uniform: 2x1 black|white halves → 1x1 mean is mid-gray
    val bw = Image(2, 1, Array(0x000000, 0xfefefe))
    assert(Multimodal.resize(bw, 1, 1).pixels.head == 0x7f7f7f)
  }

  test("frameSample: k evenly-spaced frames per payload") {
    val out = Multimodal.sampleFrames(media, k = 3).collect()
    assert(out.length == 15)
    assert(out.groupBy(_.id).values.forall(_.length == 3))
    out.foreach(f => assert(f.frame.nonEmpty && f.frame.length <= 16))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.cv.PlayerIdent
import graft.ml.QuarterPrediction

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("pipeline-spec", cores = 8)
  val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------------- ML

  test("quarter prediction: deterministic seeded train+score, msg contract") {
    val out1 = QuarterPrediction.trainAndScore(spark, sf).collect()
    val out2 = QuarterPrediction.trainAndScore(spark, sf).collect()
    assert(out1.nonEmpty)
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    out1.foreach { r =>
      val prob = r.getAs[Double]("prob")
      assert(prob >= 0.0 && prob <= 1.0)
      // Q5 message contract: "{pred},{prob}" with 2-dp rounding at the edge
      assert(r.getAs[String]("msg").matches("""\d+,\d+(\.\d+)?"""))
    }
  }

  test("quarter prediction: model actually learns (train accuracy > majority)") {
    val df = QuarterPrediction.trainingFrame(spark, sf).cache()
    val scored = QuarterPrediction.score(QuarterPrediction.train(df), df)
    val n = scored.count().toDouble
    val correct = scored.filter("prediction = winPeriod").count().toDouble
    val majority = math.max(
      df.filter("winPeriod = 1").count(), df.filter("winPeriod = 0").count()).toDouble
    assert(correct / n > majority / n, s"accuracy ${correct / n} <= majority ${majority / n}")
  }

  // ------------------------------------------------------------------- CV

  test("player pipeline: explode + broadcast lookup + not-found sentinel") {
    import spark.implicits._
    val images = (1 to 10).map(i => (i.toLong, s"synthetic image payload $i".getBytes))
      .toDF("id", "img")
    val stats = Seq(
      ("team_a", 3, 10.0, 5.0, 2.0), ("team_b", 7, 8.0, 4.0, 1.0))
      .toDF("team", "num", "score", "reb", "ast")
    val out = PlayerIdent.pipeline(spark, images, "img", stats).collect()
    assert(out.nonEmpty)
    val statuses = out.map(_.getAs[String]("status")).toSet
    assert(statuses.subsetOf(Set("ok", "player not found")))
    out.filter(_.getAs[String]("status") == "player not found")
      .foreach(r => assert(r.isNullAt(r.fieldIndex("score"))))
    // Q4 fixed: misses never crash, they carry the sentinel
  }

  test("full pipeline over the PAF estimator: CNN seam → assembly → gate → detection") {
    import spark.implicits._
    import graft.cv.Heatmaps.{HeatmapCnn, HeatmapPoseEstimator}
    import graft.cv.PafAssembly
    // one seated person, keypoints mirroring StubPose's gate-passing
    // geometry; 1-based part id -> (x, y)
    val pts = Map(
      2 -> (30, 12),  // neck      (idx 1)
      3 -> (22, 14),  // r shoulder(idx 2)
      6 -> (40, 14),  // l shoulder(idx 5)
      9 -> (26, 34),  // r hip     (idx 8)
      10 -> (40, 36), // r knee    (idx 9) — bent forward: passes ≤110° gate
      12 -> (38, 34), // l hip     (idx 11)
      13 -> (24, 36)) // l knee    (idx 12)
    val limbs = Seq(0, 1, 6, 7, 9, 10) // (2,3)(2,6)(2,9)(9,10)(2,12)(12,13)
    val cnn = new HeatmapCnn {
      def heatmaps(img: PlayerIdent.Image): Array[Array[Float]] =
        Array.tabulate(18) { c =>
          val m = new Array[Float](img.w * img.h)
          pts.get(c + 1).foreach { case (x, y) => m(y * img.w + x) = 0.9f }
          m
        }
      def pafs(img: PlayerIdent.Image): Array[Array[Float]] = {
        val paf = Array.fill(38)(new Array[Float](img.w * img.h))
        limbs.foreach { k =>
          val (a1, b1) = PafAssembly.limbSeq(k)
          val (ax, ay) = pts(a1); val (bx, by) = pts(b1)
          val n = math.sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay))
          val (cx, cy) = PafAssembly.pafIdx(k)
          java.util.Arrays.fill(paf(cx), ((bx - ax) / n).toFloat)
          java.util.Arrays.fill(paf(cy), ((by - ay) / n).toFloat)
        }
        paf
      }
    }
    val estimator = new HeatmapPoseEstimator(cnn, scales = Seq(1.0), sigma = 0.5)
    // the estimator assembles exactly one person carrying all 7 parts
    val persons = estimator.estimate(PlayerIdent.Image(64, 64, new Array[Int](64 * 64)))
    assert(persons.length == 1)
    val kp = persons.head.keypoints
    pts.foreach { case (part, (x, y)) =>
      assert(kp(part - 1).contains((x.toDouble, y.toDouble, 0.9f.toDouble)),
        s"part $part missing/misplaced: ${kp(part - 1)}")
    }
    // and it drives the WHOLE relational pipeline: gate passes, torso crop
    // from the assembled shoulders, digit + team resolved, stats joined
    val sureClassifier = new PlayerIdent.PatchClassifier {
      def detectProb(img: PlayerIdent.Image, box: graft.cv.Geometry.Box) = 0.9
      def recognize(img: PlayerIdent.Image, box: graft.cv.Geometry.Box) = 7
    }
    val cfg = PlayerIdent.Config(pose = estimator, classifier = sureClassifier)
    val images = Seq((1L, "img-bytes".getBytes)).toDF("id", "img")
    // two disjoint proposals survive NMS → T2 composes tens/units: 7,7 → 77
    val stats = Seq(("team_a", 77, 10.0, 5.0, 2.0), ("team_b", 77, 8.0, 4.0, 1.0))
      .toDF("team", "num", "score", "reb", "ast")
    val out = PlayerIdent.pipeline(spark, images, "img", stats, cfg).collect()
    assert(out.length == 1, s"expected one detection, got ${out.toSeq}")
    assert(out.head.getAs[Int]("num") == 77)
    assert(out.head.getAs[String]("status") == "ok")
  }

  test("player pipeline is deterministic and null-safe") {
    import spark.implicits._
    val cfg = PlayerIdent.Config()
    val det1 = PlayerIdent.identifyPlayers("abc".getBytes, cfg)
    val det2 = PlayerIdent.identifyPlayers("abc".getBytes, cfg)
    assert(det1 == det2)
    assert(PlayerIdent.identifyPlayers(Array.emptyByteArray, cfg).isEmpty)
    assert(PlayerIdent.identifyPlayers(null, cfg).isEmpty)
    // empty-payload rows flow through the relational pipeline silently
    val images = Seq((1L, Array.emptyByteArray)).toDF("id", "img")
    val stats = Seq(("team_a", 3, 10.0, 5.0, 2.0)).toDF("team", "num", "score", "reb", "ast")
    assert(PlayerIdent.pipeline(spark, images, "img", stats).count() == 0)
  }
}

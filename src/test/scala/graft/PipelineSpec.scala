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

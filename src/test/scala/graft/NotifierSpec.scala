package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ml.QuarterPrediction
import graft.notify.Notifier

class NotifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("notifier-spec", cores = 4)

  test("quarter message templates match the reference contract (Q3/Q5)") {
    val (v1, v2, v3) = Notifier.quarterMessage(1, 0.8571)
    assert(v1 == "本節獲勝預測結果:")
    assert(v2 == "你們這節會贏")
    assert(v3 == "勝率: 0.86") // 2-dp rounding happens only at the notifier edge
    val (_, lose, _) = Notifier.quarterMessage(0, 0.5)
    assert(lose == "你們這節會輸")
  }

  test("player message template carries team/num/stats (Q5/Q6)") {
    val (v1, v2, v3) = Notifier.playerMessage("德親設計-進攻犯規", 17, 12.5, 3.2, 1.1)
    assert(v1 == "球員辨識結果:")
    assert(v2.contains("德親設計-進攻犯規") && v2.contains("17"))
    assert(v3 == "場均得分 12.5,籃板 3.2,助攻 1.1")
  }

  test("scored frame drains through per-partition senders, all delivered") {
    val scored = QuarterPrediction.trainAndScore(spark, "/root/testdata/sf0.001")
    val n = scored.count()
    // per-JVM recording stub (local mode → executor == driver JVM)
    val delivered = Notifier.notifyQuarter(scored, () => new Notifier.RecordingSender)
    assert(delivered == n)
  }
}

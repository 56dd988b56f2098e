package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ml.QuarterPrediction
import graft.notify.Notifier

class NotifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("notifier-spec", cores = 4)

  test("quarter message templates are verbatim ml_IFTTT.py:16-22 (Q3/Q5)") {
    val (v1, v2, v3) = Notifier.quarterMessage(1, 0.8571)
    assert(v1 == "Penrite更好的機油 隊長您好")
    assert(v2 == "[預測]本節得分將 多於 對手")
    assert(v3 == "--請繼續保持狀態--")
    val (_, lose, adv) = Notifier.quarterMessage(0, 0.5)
    assert(lose == "[預測]本節得分將 少於 對手")
    assert(adv == "--請調整陣容配置--")
  }

  test("player message template is verbatim dl_IFTTT.py:22-23 (Q5/Q6)") {
    val (v1, v2, v3) = Notifier.playerMessage("德親設計-進攻犯規", 17, 12.5, 3.2, 1.1)
    assert(v1 == "德親設計-進攻犯規 17號球員即將上場")
    assert(v2 == "平均數據: 得分12.5, 籃板3.2, 助攻1.1")
    assert(v3 == "") // the reference sends an empty value3
  }

  test("IftttSender GETs the maker-webhook URL and honors the Congr contract") {
    // loopback HTTP server standing in for maker.ifttt.com (zero egress)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.atomic.AtomicReference[String]("")
    server.createContext("/", { exchange =>
      seen.set(exchange.getRequestURI.toString)
      val body =
        if (exchange.getRequestURI.getPath.contains("/key/goodkey"))
          "Congratulations! You've fired the event".getBytes("UTF-8")
        else "Bad request".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val ok = new Notifier.IftttSender("myEvent", "goodkey", base)
        .send("Penrite更好的機油 隊長您好", "[預測]本節得分將 多於 對手", "")
      assert(ok, "Congr-prefixed response must count as delivered")
      assert(seen.get.startsWith("/trigger/myEvent/with/key/goodkey?value1="))
      assert(seen.get.contains("value2=") && seen.get.contains("value3="))
      val bad = new Notifier.IftttSender("myEvent", "badkey", base)
        .send("a", "b", "c")
      assert(!bad, "non-Congr response must count as undelivered")
    } finally server.stop(0)
  }

  test("scored frame drains through per-partition senders, all delivered") {
    val scored = QuarterPrediction.trainAndScore(spark, "/root/testdata/sf0.001")
    val n = scored.count()
    // per-JVM recording stub (local mode → executor == driver JVM)
    val delivered = Notifier.notifyQuarter(scored, () => new Notifier.RecordingSender)
    assert(delivered == n)
  }
}

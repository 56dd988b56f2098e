package graft.notify

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** IFTTT/LINE notifier layer — the rebuild of `ml_IFTTT.py` / `dl_IFTTT.py`
  * (SURVEY §2.2 K3). The reference runs these as separate Kafka-consumer
  * processes that parse the output topic's CSV value, format a fixed
  * Chinese message, and GET a webhook URL, treating a response starting
  * with "Congr" as delivered (ml_IFTTT.py:32).
  *
  * The message templates are part of the observable output contract (Q5)
  * and are reproduced verbatim. The HTTP edge is a pluggable seam (zero
  * egress here; production injects a java.net.http-based sender).
  */
object Notifier {

  /** value1/value2/value3 of the quarter-prediction webhook, VERBATIM from
    * ml_IFTTT.py:16-22: a fixed greeting, prediction mapped to the
    * more/fewer-points phrase, and a keep-it-up/adjust-lineup exhortation.
    * The probability is parsed and 2-dp rounded at this edge exactly as the
    * reference does (ml_IFTTT.py:15) even though the message omits it (Q3). */
  def quarterMessage(prediction: Int, probability: Double): (String, String, String) = {
    // ml_IFTTT.py:15 parses + 2-dp-rounds the probability and then never
    // includes it in the message — only the prediction selects the text
    if (prediction == 1)
      ("Penrite更好的機油 隊長您好", "[預測]本節得分將 多於 對手", "--請繼續保持狀態--")
    else
      ("Penrite更好的機油 隊長您好", "[預測]本節得分將 少於 對手", "--請調整陣容配置--")
  }

  /** The player-stats message VERBATIM from dl_IFTTT.py:22-23 over the
    * "{team},{num},{score},{reb},{ast}" payload; value3 is empty (Q5/Q6). */
  def playerMessage(team: String, num: Int, score: Double, reb: Double, ast: Double): (String, String, String) =
    (s"$team ${num}號球員即將上場",
      s"平均數據: 得分$score, 籃板$reb, 助攻$ast", "")

  /** Webhook sender seam. Production: java.net.http GET to
    * maker.ifttt.com/trigger/<event>/with/key/<key>?value1=..&value2=..&value3=..;
    * delivery is "response startsWith 'Congr'" per the reference. */
  trait WebhookSender extends Serializable {
    def send(value1: String, value2: String, value3: String): Boolean
  }

  /** Deterministic stub: records messages in-memory (per-JVM) and reports
    * delivered — the reference's own "Congr" check reduced to a boolean. */
  class RecordingSender extends WebhookSender {
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]
    def send(v1: String, v2: String, v3: String): Boolean = {
      sent.add((v1, v2, v3)); true
    }
  }

  /** Production sender: GET to the IFTTT maker webhook exactly as
    * ml_IFTTT.py:27-32 / dl_IFTTT.py:26-31 — URL
    * `https://maker.ifttt.com/trigger/<event>/with/key/<key>?value1=..&value2=..&value3=..`,
    * delivered iff the response body starts with "Congr". Values are
    * URL-encoded (the reference concatenates raw CJK text and relies on
    * requests' escaping — encoding here is the same observable request).
    * Unused by default in this zero-egress environment; injected via
    * `notifyQuarter(df, () => new IftttSender(event, key))` in production. */
  class IftttSender(event: String, key: String,
      baseUrl: String = "https://maker.ifttt.com") extends WebhookSender {
    @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
    private def enc(s: String) =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    def send(v1: String, v2: String, v3: String): Boolean = {
      val uri = java.net.URI.create(
        s"$baseUrl/trigger/$event/with/key/$key" +
          s"?value1=${enc(v1)}&value2=${enc(v2)}&value3=${enc(v3)}")
      val req = java.net.http.HttpRequest.newBuilder(uri).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      resp.body().startsWith("Congr") // ml_IFTTT.py:32
    }
  }

  /** Drain a scored quarter-prediction frame ("prediction", "prob" columns)
    * through the notifier — the foreachPartition shape of the reference's
    * consumer loop (one sender per partition, ml_IFTTT.py:10-31). */
  def notifyQuarter(scored: DataFrame, mkSender: () => WebhookSender): Long = {
    val rows = scored.select(
      col("prediction").cast("int"), col("prob").cast("double"))
    rows.rdd.mapPartitions { it =>
      val sender = mkSender() // per-partition connection, as the reference pools producers
      var n = 0L
      it.foreach { r =>
        val (v1, v2, v3) = quarterMessage(r.getInt(0), r.getDouble(1))
        if (sender.send(v1, v2, v3)) n += 1
      }
      Iterator.single(n)
    }.sum().toLong
  }
}

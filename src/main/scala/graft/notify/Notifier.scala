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

  /** value1/value2/value3 of the quarter-prediction webhook
    * (ml_IFTTT.py:14-23): prediction mapped to a win/lose phrase, the
    * probability rounded to 2 dp ONLY here at the notifier edge (Q3). */
  def quarterMessage(prediction: Int, probability: Double): (String, String, String) = {
    val outcome = if (prediction == 1) "贏" else "輸"
    (s"本節獲勝預測結果:", s"你們這節會$outcome", f"勝率: ${math.round(probability * 100) / 100.0}%.2f")
  }

  /** The player-stats message of dl_IFTTT.py:22-23 over the
    * "{team},{num},{score},{reb},{ast}" payload (Q5/Q6). */
  def playerMessage(team: String, num: Int, score: Double, reb: Double, ast: Double): (String, String, String) =
    (s"球員辨識結果:", s"$team 隊,背號 $num",
      s"場均得分 $score,籃板 $reb,助攻 $ast")

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

package graft

import org.apache.spark.sql.functions._

/** Dev scratch: prints the `ml_rf_score` canonical (rows, md5) at sf0.001 —
  * the value pinned as [[RfGolden]]. Rerun and re-pin ONLY with a commit
  * that deliberately changes the model.
  *
  * Usage: sbt 'Test/runMain graft.GoldenDump'
  */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.localSession("golden-dump", cores = 8)
    val df = SparkEntry.queries("ml_rf_score")(spark, "/root/testdata/sf0.001")
    val cols = df.columns.sorted
      .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
    val lines = df.select(concat_ws("\u0001", cols: _*).as("l"))
      .collect().map(_.getString(0)).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    println(s"GOLDEN rows=${lines.length} md5=${md.digest().map("%02x".format(_)).mkString}")
    spark.stop()
  }
}

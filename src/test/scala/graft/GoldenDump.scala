package graft

import org.apache.spark.sql.functions._

/** Dev scratch: prints the canonical (rows, md5) of each rows-only query at
  * sf0.001 — the values pinned as [[RfGolden]] and [[CvGolden]]. The
  * canonicalization is byte-identical to DeterminismSpec.canon. Rerun and
  * re-pin ONLY with a commit that deliberately changes the model/pipeline.
  *
  * Usage: sbt 'Test/runMain graft.GoldenDump [queryName ...]'
  */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.localSession("golden-dump", cores = 8)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("ml_rf_score", "cv_player_pipeline")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val cols = df.columns.sorted
        .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
      val lines = df.select(concat_ws("\u0001", cols: _*).as("l"))
        .collect().map(_.getString(0)).sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
      println(s"GOLDEN $name rows=${lines.length} md5=${md.digest().map("%02x".format(_)).mkString}")
    }
    spark.stop()
  }
}

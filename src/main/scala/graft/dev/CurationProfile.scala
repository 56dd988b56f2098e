package graft.dev

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Jobs

/** One-off profiler for the curation stream's per-trigger cost (round-10
  * VERDICT #2): dumps the full per-batch `durationMs` / state-operator
  * breakdown from StreamingQueryProgress so the ~4 s fixed cost can be
  * attributed to a phase (state commit, planning, addBatch, WAL) instead
  * of guessed at. Dev tool — not part of the driver contract.
  *
  * Usage: runMain graft.dev.CurationProfile [sfDir] [nBatches]
  */
object CurationProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Tables.localSession("curation-profile", cores = 32)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val evalSet = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 50 === 0).select("text").cache()
    evalSet.count()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val t0 = 1700000000000000L
    val mem = MemoryStream[(Long, String, Long)]
    val shaped = mem.toDF().toDF("doc_id", "text", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val ckpt = java.nio.file.Files.createTempDirectory("cur-prof").toString
    val q = Jobs.curationSink(Jobs.curationStream(shaped, evalSet),
        budget = Long.MaxValue / 4) { (sel, _) => sel.count(); () }
      .option("checkpointLocation", ckpt).start()
    val per = math.max(1, (docs.length + nBatches - 1) / nBatches)
    docs.grouped(per).foreach { g =>
      mem.addData(g.map { case (id, t) => (id, t, t0) }.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} " +
        p.stateOperators.map(so =>
          s"state[commit=${so.commitTimeMs}ms rows=${so.numRowsTotal} " +
          s"mem=${so.memoryUsedBytes}]").mkString(" "))
    }
    q.stop()
    spark.stop()
  }
}

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
    // shipped ingest sizing (see StreamLatencyProbe) — CURPROF_CONF
    // below can override it for A/B runs
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // A/B conf harness: CURPROF_CONF="k=v;k=v" applies session-level
    // overrides (shuffle partitions, state-store provider, …) so a
    // candidate fix is priced before it ships into the probe/spec
    // sessions. Streaming-relevant confs are read at query START, so
    // setting them here (before .start()) is sufficient.
    sys.env.get("CURPROF_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
        println(s"[curprof] conf override: ${k.trim}=${v.trim}")
      })
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
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    prog.foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} " +
        p.stateOperators.map(so =>
          s"state[commit=${so.commitTimeMs}ms rows=${so.numRowsTotal} " +
          s"mem=${so.memoryUsedBytes}]").mkString(" "))
    }
    // warm p50 (first batch excluded — codegen compile), one line for A/B
    val warm = prog.drop(1)
      .map(_.durationMs.get("triggerExecution").longValue()).sorted
    if (warm.nonEmpty)
      println(s"[curprof] warm p50 ${warm(warm.size / 2)} ms over " +
        s"${warm.size} batches")
    q.stop()
    spark.stop()
  }
}

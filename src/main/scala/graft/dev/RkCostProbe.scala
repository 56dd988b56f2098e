package graft.dev

import graft.core.Tables

/** One-off decision harness for the round-11 probe-width frontier: times
  * the individual rk-chain consumers on a CACHED ×32 amplified corpus
  * (reusing ScaleProbe's amplifier) so the width tax can be attributed to
  * a stage — the candidate-join volume, the per-src rank window's
  * shuffle, or the iterative walkers on top — instead of inferred from
  * whole-query deltas. Dev tool, not part of the driver contract.
  *
  * Usage: runMain graft.dev.RkCostProbe [baseSfDir] [ampDir] [factor]
  */
object RkCostProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val amp = args.lift(1).getOrElse("/tmp/graft-amp32")
    val factor = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = Tables.localSession("rk-cost-probe", cores = 32)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$amp/embeddings.parquet"))) {
      ScaleProbe.amplify(spark, base, factor, amp)
      println(s"[rkcost] amplified x$factor into $amp")
    }
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      org.apache.spark.sql.GraftSqlBridge.dropTopLevelSort(mk)
        .write.format("noop").mode("overwrite").save()
      println(f"[rkcost] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val qs = sys.env.get("RKCOST_QUERIES")
      .map(_.split(',').map(_.trim).toSeq)
      .getOrElse(Seq("sim_knn_graph", "sim_hard_negatives", "graph_pagerank",
        "graph_label_prop"))
    qs.foreach { q => time(q)(graft.SparkEntry.queries(q)(spark, amp)) }
    spark.stop()
  }
}

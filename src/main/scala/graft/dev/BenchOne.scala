package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of SparkEntry.queries exactly like Bench
  * (noop sink, top-level sort stripped, cache cleared between passes),
  * printing per-pass seconds — for iterating on one slow query without
  * the full 140-query sweep.
  *
  * Usage: runMain graft.dev.BenchOne <sfDir> <passes> <name> [<name> ...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val passes = args(1).toInt; val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to passes).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        org.apache.spark.sql.GraftSqlBridge.dropTopLevelSort(fn(spark, sfDir))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name: ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}

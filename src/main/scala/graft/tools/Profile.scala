package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler: time named queries repeatedly on one sf dir.
  * Usage: runMain graft.tools.Profile <sfDir> <n> <query...> */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to n).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        org.apache.spark.sql.GraftSqlBridge.dropTopLevelSort(fn(spark, sfDir))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev harness: run a subset of SparkEntry.queries and dump each result +
  * its oracle SQL, for a fast local DuckDB compare while iterating on a new
  * query (Verify runs the full ~100-query sweep; this runs just the ones
  * under development).
  *
  * Usage: runMain graft.dev.SpotCheck <sfDir> <outDir> <name> [<name> ...]
  */
object SpotCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      spark.catalog.clearCache()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.SparkEntry.oracleSql.get(name).foreach(sql =>
        Files.writeString(Paths.get(s"$outDir/$name.sql"), sql))
    }
    spark.stop()
  }
}

package graft.dev

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev harness: write each named query's `.explain("formatted")` output to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence an
  * optimization round commits next to its bench numbers.
  *
  * The query is EXECUTED first (noop sink, like Bench) so the dumped plan
  * is the AQE-final one; queries that materialize intermediates via
  * localCheckpoint run those jobs as a side effect, exactly as in Bench —
  * their plan files show the post-checkpoint consumer plan, and the
  * checkpointed sub-jobs are described in OPTIMIZATION notes instead.
  *
  * Usage: runMain graft.dev.PlanSnap <sfDir> <outDir> <suffix> <name> [...]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3)
    val spark = graft.core.Tables.localSession("plan-snap")
    spark.conf.set("spark.sql.maxMetadataStringLength", 250)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[plansnap] $name execute failed: ${e.getMessage}")
      }
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

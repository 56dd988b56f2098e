package graft.dev

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}

/** Dev harness: print every logical Window of the named queries with its
  * partition spec and the count of Aggregate nodes beneath it — the raw
  * evidence behind the "no unpartitioned corpus-sized window" guards in
  * PlanSpec.
  *
  * Usage: runMain graft.dev.WindowAudit <sfDir> <query>[,<query>...]
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(Seq("corpus_token_budget", "corpus_curation_e2e"))
    val spark = graft.core.Tables.localSession("window-audit", cores = 8)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val wins = df.queryExecution.optimizedPlan.collect { case w: Window => w }
      println(s"== $name: ${wins.length} windows")
      wins.foreach { w =>
        val aggsBelow = w.child.collect { case a: Aggregate => a }.length
        println(s"  partitionSpec=[${w.partitionSpec.mkString(", ")}] " +
          s"foldableOnly=${w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.foldable)} " +
          s"aggsBelow=$aggsBelow")
      }
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.rowsOnly
import graft.cv.PlayerIdent
import graft.ml.QuarterPrediction

/** The reference's two end-to-end pipelines as declared queries (rows-only
  * checks — RF scoring and the CV UDF chain are not SQL-expressible).
  */
object Pipelines {

  /** Quarter prediction: train (seeded) + score + "{pred},{prob}" output
    * over features derived from the sfDir tables (SURVEY §3.1/§3.3). */
  val mlRfScore = rowsOnly("ml_rf_score") { (s, d) =>
    QuarterPrediction.trainAndScore(s, d)
  }

  /** Player identification: binary image column → pose/digit/color stub
    * pipeline → explode detections → broadcast stats lookup (SURVEY §3.2).
    * Images are synthesized from document text bytes (no image corpus in
    * testdata); the stats dimension is generated to cover both teams. */
  val cvPlayerPipeline = rowsOnly("cv_player_pipeline") { (s, d) =>
    val images = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("img"))
    val stats = s.range(0, 100).select(
      explode(array(lit("team_a"), lit("team_b"))).as("team"),
      col("id").cast("int").as("num"),
      round(col("id") * 1.7 % 30, 1).as("score"),
      round(col("id") * 1.3 % 15, 1).as("reb"),
      round(col("id") * 0.7 % 12, 1).as("ast"))
      .filter(col("num") % 3 =!= 0) // force some 'player not found' misses
    PlayerIdent.pipeline(s, images, "img", stats)
      .withColumn("msg", concat_ws(",",
        col("team"), col("num"), col("score"), col("reb"), col("ast")))
      .orderBy("doc_id", "team", "num")
  }

  val defs: Seq[QueryDef] = Seq(mlRfScore, cvPlayerPipeline)
}

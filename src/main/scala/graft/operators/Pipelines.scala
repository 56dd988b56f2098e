package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.{rowsOnly, sql}
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

  /** The ML pipeline's deterministic feature frame, oracle-checked: every
    * column of `QuarterPrediction.trainingFrame` is integer groupBy/join
    * arithmetic (quantity doubles are integer-valued, prices are rounded to
    * exact cents per row before summing), so the entire surface up to the
    * RandomForest boundary hash-verifies against DuckDB — only the model
    * transform itself stays rows-only (`ml_rf_score`). */
  val mlFeatures = sql(
    "ml_features",
    """WITH feat AS (
      |  SELECT l_orderkey,
      |         CAST(max(l_partkey) % 3 AS INT) AS "enemyStyle",
      |         CAST(sum(l_quantity) AS INT) AS "teamNumber",
      |         CAST(fmod(sum(l_quantity), 19) AS INT) AS "enemyNumber",
      |         CAST(count(*) AS INT) AS "fastBreak",
      |         CAST(sum(l_linenumber) % 7 AS INT) AS "restrictedNumber",
      |         CAST(max(l_suppkey) % 11 AS INT) AS "perimeterNumber",
      |         CAST(min(l_partkey) % 5 AS INT) AS "threeNumber",
      |         CAST(sum(l_partkey) % 6 AS INT) AS "freethrowNumber",
      |         CAST(max(l_linenumber) AS INT) AS "assist",
      |         CAST(min(l_suppkey) % 4 AS INT) AS "steal",
      |         CAST(sum(l_suppkey) % 3 AS INT) AS "block",
      |         CAST(fmod(max(l_quantity), 8) AS INT) AS "foul",
      |         CAST(fmod(min(l_quantity), 9) AS INT) AS "turnover",
      |         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) % 30 AS INT)
      |           AS "enemyPeriodScore"
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT f.l_orderkey AS "rowId", f."enemyStyle", f."teamNumber",
      |       f."enemyNumber", f."fastBreak", f."restrictedNumber",
      |       f."perimeterNumber", f."threeNumber", f."freethrowNumber",
      |       f."assist", f."steal", f."block", f."foul", f."turnover",
      |       f."enemyPeriodScore",
      |       CAST(o.o_totalprice > 150000 AS INT) AS "winPeriod"
      |FROM feat f JOIN orders o ON f.l_orderkey = o.o_orderkey
      |ORDER BY "rowId"""".stripMargin) { (s, d) =>
    QuarterPrediction.trainingFrame(s, d).orderBy("rowId")
  }

  /** Player identification: binary image column → pose/digit/color stub
    * pipeline → explode detections → broadcast stats lookup (SURVEY §3.2).
    * Images are synthesized from document text bytes (no image corpus in
    * testdata); the stats dimension is generated to cover both teams.
    *
    * ORACLE-CHECKED since round 8: every stage of the stub pipeline is
    * deterministic integer/IEEE math over the payload bytes, and
    * [[CvOracle.pipelineSql]] replays it stage-for-stage in DuckDB
    * (splitmix decode → box denoise → pose → acos gate → box-sum digit
    * spotting with closed-form 3-box NMS → 10-round Lloyd's k-means →
    * L1 team → stats join). The stat columns are integer-exact k/10
    * arithmetic (not round(double·fmod)) so values AND their string
    * renderings in `msg` agree bit-for-bit across engines. */
  val cvPlayerPipeline = sql("cv_player_pipeline", CvOracle.pipelineSql) {
    (s, d) =>
      val images = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("img"))
      val stats = s.range(0, 100).select(
        explode(array(lit("team_a"), lit("team_b"))).as("team"),
        col("id").cast("int").as("num"),
        (col("id") * 17 % 300 / 10.0).as("score"),
        (col("id") * 13 % 150 / 10.0).as("reb"),
        (col("id") * 7 % 120 / 10.0).as("ast"))
        .filter(col("num") % 3 =!= 0) // force some 'player not found' misses
      PlayerIdent.pipeline(s, images, "img", stats)
        .withColumn("msg", concat_ws(",",
          col("team"), col("num"), col("score"), col("reb"), col("ast")))
        .orderBy("doc_id", "team", "num")
  }

  val defs: Seq[QueryDef] = Seq(mlRfScore, mlFeatures, cvPlayerPipeline)
}

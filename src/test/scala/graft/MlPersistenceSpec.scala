package graft

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ml.QuarterPrediction

/** K4 (SURVEY §2.2): MLWritable/MLReadable persistence — the fitted
  * pipeline (encoder INCLUDED, fixing quirk Q1: the reference persists the
  * unfitted estimator and re-fits per batch) saves and reloads to identical
  * scores. */
class MlPersistenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("ml-persist-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("fitted pipeline save/load round trip scores identically") {
    val df = QuarterPrediction.trainingFrame(spark, sf).cache()
    val model = QuarterPrediction.train(df)
    val dir = Files.createTempDirectory("qp-model").toString + "/model"
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = QuarterPrediction.score(model, df)
      .select("rowId", "prediction", "prob").collect().map(_.toString).sorted
    val b = QuarterPrediction.score(loaded, df)
      .select("rowId", "prediction", "prob").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("AUC evaluator runs on scored output (A9, the intended metric)") {
    val df = QuarterPrediction.trainingFrame(spark, sf).cache()
    val scored = QuarterPrediction.score(QuarterPrediction.train(df), df)
    val auc = QuarterPrediction.auc(scored)
    assert(auc > 0.5 && auc <= 1.0, s"AUC $auc not better than random")
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.TextOps

/** Hot-shingle document-frequency cap on the n-gram Jaccard near-dup join:
  * a boilerplate shingle shared by more documents than the cap would form a
  * single quadratic join bucket at 100 TB, so it is excluded from the
  * shingle universe BEFORE the self-join. */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("textops-spec", cores = 8)

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("textops-docs").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("shingles above the df cap are dropped before the pair join") {
    val boiler = (1 to 12).map(i => s"tok$i").mkString(" ") // 10 shingles
    val unique = (1 to 12).map(i => s"rare$i").mkString(" ")
    val dir = writeDocs(
      // df = 60 > ShingleDfCap for every boilerplate shingle → no signal
      (0L until 60L).map(i => i -> boiler) ++
        // genuine near-dup pair on low-df shingles → must survive the cap
        Seq(100L -> unique, 101L -> unique))
    assert(TextOps.ShingleDfCap < 60 && TextOps.ShingleDfCap > 2)
    val got = TextOps.dedupNgramJaccard.fn(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    // without the cap this would be C(60,2)+1 = 1771 pairs; the 60-way
    // boilerplate clique carries no near-dup information
    assert(got.toSeq == Seq((100L, 101L)))
  }

  test("cap is applied as an anti-join on the hot-key list (plan shape)") {
    val dir = writeDocs(Seq(1L -> "a b c d", 2L -> "a b c e"))
    val plan = TextOps.dedupNgramJaccard.fn(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected LeftAnti in:\n$plan")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.WinnowFps

/** The native winnowing selector must match a direct model of the oracle
  * SQL (gram hashes → w-window minima over hash·2²⁰+pos → distinct,
  * first-occurrence order) value-for-value, including tie and edge
  * behavior. */
class WinnowFpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("winnow-fps-spec", cores = 8)

  /** Plain-Scala transcription of the DuckDB oracle semantics. */
  private def model(text: String, k: Int, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams < w) return Seq.empty
    val grams = (0 until nGrams).map { i =>
      val h = (i until i + k).foldLeft(0L)((acc, j) => (acc * 31 + cps(j)) % 1000000007L)
      h * 1048576L + i
    }
    (0 to nGrams - w).map(j => grams.slice(j, j + w).min).distinct
  }

  private def native(texts: Seq[String], k: Int, w: Int): Seq[Seq[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(WinnowFps.winnow_fps(col("text"), k, w).as("fps"))
      .collect()
      .map(_.getSeq[Long](0).toSeq)
      .toSeq
  }

  test("matches the oracle model on hand-picked edges and random text") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefg XY09.,"
    val texts = Seq(
      "",                      // empty
      "short",                 // < k chars
      "exactly8",              // one gram < w windows
      "exactly11ch",           // first length with a window (k+w-1)
      "aaaaaaaaaaaaaaaaaaaa",  // all-equal hashes: leftmost-tie per window
      "the quick brown fox jumps over the lazy dog") ++
      (1 to 30).map(_ => (1 to (rnd.nextInt(60) + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = native(texts, 8, 4)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == model(t, 8, 4), s"mismatch for ${t.take(30)}…")
    }
  }

  test("non-default k and w honor the same contract") {
    val texts = Seq("abcdefghijklmnop", "zzzzzzzzzzzz", "ab")
    val got = native(texts, 3, 5)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == model(t, 3, 5), s"mismatch for $t")
    }
  }

  test("stays inside whole-stage codegen") {
    // a local relation would collapse to LocalTableScan (no codegen stage);
    // probe over a real parquet scan like the production query
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(WinnowFps.winnow_fps(col("text"), 8, 4).as("fps"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "winnow_fps must not break whole-stage codegen")
  }
}

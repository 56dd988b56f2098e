package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Run-twice determinism gate for the rows-only queries.
  *
  * Queries without an `oracleSql` entry (the stub-codec CV pipeline and
  * the RandomForest transform — not SQL-expressible) get only a rows>0
  * check from the driver, which would miss a nondeterminism regression
  * (an unseeded sample, a rand(), a reduce-order-sensitive float path).
  * This spec closes that hole: each such query runs TWICE in the same
  * session and must produce byte-identical canonical content — row count
  * plus an order-insensitive md5 over every cell rendered to string.
  */
/** Pinned-seed golden canonical output of `ml_rf_score` at sf0.001
  * (computed by [[GoldenDump]]; the RF fit is fully seeded). Re-pin ONLY
  * in a commit that deliberately changes the model. */
object RfGolden {
  // re-pinned in round 10 with the deliberate training-layout change:
  // trainDf is now repartition(4, rowId) + sortWithinPartitions (bit-
  // stable under any ambient session config) instead of coalesce(4)
  // (which inherited AQE-dependent upstream partitioning — MLlib RF
  // split-finding samples per partition, so the old pin was only valid
  // for AQE-on-first-train suite orders)
  val rows = 1473L
  val md5 = "0d19350294fac2974935885afd3a3c57"
}

/** Pinned golden canonical output of `cv_player_pipeline` at sf0.001
  * (computed by [[GoldenDump]]; every stage — stub decode, stub pose,
  * posture gate, digit spotting, seeded k-means color, stats join — is
  * deterministic). Re-pin ONLY in a commit that deliberately changes the
  * pipeline. */
object CvGolden {
  val rows = 613L
  val md5 = "ce0907bb6a6312fe942492b4c7886bdd"
}

class DeterminismSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("determinism-spec", cores = 8)
  val sf = "/root/testdata/sf0.001"

  /** (row count, md5 of sorted canonical row strings). Cells cast to
    * string with an explicit null marker; rows joined with U+0001 (cannot
    * collide with real text, which the generator keeps printable). */
  private def canon(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted
      .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
    val lines = df.select(concat_ws("\u0001", cols: _*).as("l"))
      .collect().map(_.getString(0)).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    (lines.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  private val rowsOnly =
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted

  test("rows-only set is the expected one (new queries must ship an oracle)") {
    // Growing this list is a deliberate act: a new query landing here gets
    // the weaker rows-only driver check, so the set is pinned. (The
    // multimodal pair left it in round 7, the CV pipeline in round 8, and
    // in round 9 the RandomForest transform itself gained a compiled-forest
    // oracle — ml_rf_score is rows-only ONLY in a fresh JVM where no model
    // has been trained yet; once any suite scores it, the trained forest
    // compiles to oracle SQL and the set is empty.)
    assert(rowsOnly.isEmpty || rowsOnly == Seq("ml_rf_score"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("ml_rf_score: pinned-seed golden content hash (sf0.001)") {
    // Run-twice self-consistency alone would pass a deterministic-but-
    // WRONG regression; this pins the actual scored output. The RF fit is
    // fully seeded (DeterminismSpec's run-twice test proves the fit is
    // stable within a session; this constant proves it is stable across
    // sessions/commits). If a deliberate model change shifts the output,
    // re-pin BOTH values with the commit that changes the model.
    val (n, h) = canon(SparkEntry.queries("ml_rf_score")(spark, sf))
    assert((n, h) == (RfGolden.rows, RfGolden.md5),
      s"RF scored output drifted from the golden hash: got ($n, $h), " +
        s"expected (${RfGolden.rows}, ${RfGolden.md5})")
  }

  test("cv_player_pipeline: pinned golden content hash (sf0.001)") {
    // Same discipline as the RF pin: run-twice self-consistency alone
    // passes a deterministic-but-wrong regression, so the actual pipeline
    // output is pinned across sessions/commits. If a deliberate pipeline
    // change shifts the output, re-pin BOTH values with that commit.
    val (n, h) = canon(SparkEntry.queries("cv_player_pipeline")(spark, sf))
    assert((n, h) == (CvGolden.rows, CvGolden.md5),
      s"CV pipeline output drifted from the golden hash: got ($n, $h), " +
        s"expected (${CvGolden.rows}, ${CvGolden.md5})")
  }

  rowsOnly.foreach { name =>
    test(s"rows-only query $name is run-to-run deterministic") {
      val fn = SparkEntry.queries(name)
      val a = canon(fn(spark, sf))
      val b = canon(fn(spark, sf))
      assert(a._1 == b._1, s"$name row count changed between runs: ${a._1} vs ${b._1}")
      assert(a._2 == b._2, s"$name content hash changed between runs")
    }
  }
}

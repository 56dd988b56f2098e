package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.SimhashAgg.simhash_agg

/** The native SimHash aggregate must agree bit-for-bit with the explicit
  * per-bit sum(CASE) formulation (which is what the DuckDB oracle runs). */
class SimhashAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("simhash-agg-spec", cores = 8)

  private def explicitSig(vals: org.apache.spark.sql.DataFrame) = {
    val sums = vals.groupBy("g").agg(
      sum(when(shiftright(col("v"), 0) % 2 === 1, 1).otherwise(-1)).as("s0"),
      (1 until 60).map(j =>
        sum(when(shiftright(col("v"), j) % 2 === 1, 1).otherwise(-1)).as(s"s$j")): _*)
    val sig = (0 until 60)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("g"), sig.cast("long").as("sig"))
  }

  test("agrees with the 60-column sum(CASE) formulation, exercising merge") {
    import spark.implicits._
    // many groups, many partitions → partial buffers MERGE across tasks
    val vals = (0L until 50000L)
      .map(i => (i % 37, (i * 0x9e3779b97f4a7c15L) >>> 4)) // 60-bit values
      .toDF("g", "v")
      .repartition(16)
      .cache()
    val native = vals.groupBy("g").agg(simhash_agg(col("v")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val explicit = explicitSig(vals)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == explicit)
    assert(native.size == 37 && native.values.forall(_ >= 0L))
  }

  test("null inputs are ignored; empty group yields the all-negative signature") {
    import spark.implicits._
    val df = Seq[(Long, Option[Long])]((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(simhash_agg(col("v")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 5L) // single value: its set bits win, unset stay 0
    assert(out(2L) == 0L) // only nulls: every counter 0 → no bit set
  }
}

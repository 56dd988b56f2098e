package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.TopKAgg

class TopKAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("topk-agg-spec", cores = 8)

  private def topk(values: Seq[String], k: Int, cap: Int,
      partitions: Int = 1): Seq[(String, Long)] = {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(values, partitions).toDF("v")
    val arr = df.agg(TopKAgg.approx_top_k(col("v"), k, cap).as("tk"))
      .select(explode(col("tk")).as("s"))
      .select(col("s.value"), col("s.cnt")).collect()
    arr.map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("exact regime: counts and (count desc, value asc) order match exactly") {
    val vs = Seq.fill(5)("x") ++ Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq("z")
    assert(topk(vs, 3, 64) == Seq(("x", 5L), ("a", 3L), ("b", 3L)))
  }

  test("exact regime is partitioning-independent (merge path exercised)") {
    val vs = (1 to 200).map(i => s"v${i % 7}")
    val one = topk(vs, 7, 64, partitions = 1)
    val many = topk(vs, 7, 64, partitions = 8)
    assert(one == many)
    assert(one.map(_._2).sum == 200)
  }

  test("space-saving eviction: replaced minimum's count is inherited") {
    // single partition, known order: a a b c with capacity 2 —
    // c evicts (b,1) and inherits its count → (c, 2) with err 1
    assert(topk(Seq("a", "a", "b", "c"), 2, 2) == Seq(("a", 2L), ("c", 2L)))
  }

  test("over-count bounded by n/capacity in the degraded regime") {
    // 40 distinct singletons through capacity 8: every reported count is
    // an over-estimate but can never exceed ceil(n/cap) + 1 = 6
    val vs = (1 to 40).map(i => s"u$i")
    val got = topk(vs, 8, 8)
    assert(got.size == 8)
    got.foreach { case (_, c) => assert(c >= 1L && c <= 6L, s"count $c") }
  }

  test("merge-trim preserves the over-estimate invariant (floor accounting)") {
    // Degraded regime ACROSS partitions: merge must trim summaries, and a
    // naive trim (drop smallest, forget their mass) would let later
    // re-insertions UNDER-estimate — the space-saving guarantee is
    // estimate >= true count for every REPORTED value. Skewed data over
    // many partitions exercises merge-trim on every combine.
    val vs = (1 to 600).map { i =>
      if (i % 3 == 0) "hot" else if (i % 7 == 0) "warm" else s"noise${i % 97}"
    }
    val truth = vs.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val got = topk(vs, 4, 4, partitions = 16)
    assert(got.nonEmpty)
    got.foreach { case (v, c) =>
      assert(c >= truth(v),
        s"$v reported $c < true ${truth(v)} — trimmed mass was lost")
    }
    // the heavy hitter must surface despite the tiny capacity
    assert(got.map(_._1).contains("hot"))
  }

  test("merge does not double-charge values tracked on both sides") {
    // A tracked on BOTH sides must sum its tracked counts only; charging
    // it either side's floor would blow the Σ-floors bound and make merge
    // order-sensitive. One-sided B still gets the absent side's floor.
    import graft.functions.TopKAgg
    val agg = TopKAgg(
      org.apache.spark.sql.GraftSqlBridge.expression(lit("x")), 2, 2)
    def summary(floor: Long, entries: (String, (Long, Long))*) = {
      val s = new TopKAgg.Summary
      entries.foreach { case (v, ce) => s.counters(v) = ce }
      s.floor = floor
      s
    }
    val m = agg.merge(
      summary(5L, "A" -> ((6L, 5L))),
      summary(3L, "A" -> ((4L, 3L)), "B" -> ((7L, 0L))))
    assert(m.counters("A") == ((10L, 8L)), s"shared value: ${m.counters("A")}")
    assert(m.counters("B") == ((12L, 5L)), s"one-sided value: ${m.counters("B")}")
    assert(m.floor == 8L)
  }

  test("values beyond 64 KiB round-trip through serialization") {
    // writeUTF would throw UTFDataFormatException here; the length-prefixed
    // encoding must carry a long token/URL value through the shuffle
    val big = "x" * 100000
    val vs = Seq(big, big, big, "small", "small")
    val got = topk(vs, 2, 4, partitions = 2) // >1 partition forces serialize+merge
    assert(got == Seq((big, 3L), ("small", 2L)))
  }
}

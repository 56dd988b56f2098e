package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Determinism/stability properties of the hash-gated data-prep operators —
  * the whole point of hash gating over rand(): membership must not move
  * under re-partitioning, re-runs, or subsetting. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("sampling-spec", cores = 8)
  val sf = "/root/testdata/sf0.01"

  test("sample_hash: membership invariant under repartitioning and re-runs") {
    val a = SparkEntry.queries("sample_hash")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val b = SparkEntry.queries("sample_hash")(spark, sf)
      .repartition(7).collect().map(_.getLong(0)).toSet
    assert(a == b, "hash-gated sample must not depend on physical layout")
    assert(a.nonEmpty && a.size < 500, s"~10% expected, got ${a.size}/500")
  }

  test("split_assign: rates near 8/1/1, membership keyed only on doc_id") {
    val splits = SparkEntry.queries("split_assign")(spark, sf)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > 350, s"train too small: $splits") // 80% of 500
    assert(splits("val") > 20 && splits("test") > 20, s"eval too small: $splits")
  }

  test("split_leakage_safe: every near-dup cluster lands in exactly one split") {
    val out = SparkEntry.queries("split_leakage_safe")(spark, sf).cache()
    val mixed = out.groupBy("cluster")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(mixed.count() == 0, "near-dups must never straddle a split boundary")
    // and it actually differs from the doc-hash split for clustered docs
    assert(out.filter(col("cluster") =!= col("doc_id")).count() > 0,
      "fixture corpus should contain non-trivial clusters")
  }

  test("pack_sequences: token budget holds — a sequence overflows only via its last doc") {
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("pack_sequences")(spark, sf).cache()
    // every doc STARTS inside its sequence's 4096-token window, so the sum
    // of all docs in a sequence except the last one must fit the budget
    val w = Window.partitionBy("shard", "seq_id").orderBy(col("doc_id").desc)
    val overflow = out
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1) // drop the last (possibly overflowing) doc
      .groupBy("shard", "seq_id")
      .agg(sum("n_tokens").as("packed"))
      .filter(col("packed") > 4096)
    assert(overflow.count() == 0, "sequence packed beyond the token budget")
    // seq ids are dense from 0 within each shard (no skipped bins)
    val perShard = out.groupBy("shard")
      .agg(min("seq_id").as("lo"), countDistinct("seq_id").as("n"),
        max("seq_id").as("hi"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(perShard.count() == 0, "seq_id must be dense per shard")
  }
}

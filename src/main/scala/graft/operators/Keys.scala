package graft.operators

import org.apache.spark.sql.functions._

/** The md5-bucket deterministic "random" primitives and split thresholds —
  * the ONE definition shared by Sampling's gates and TextOps' incremental
  * dedup (both engine sides). Lives in its own dependency-free object for
  * the same reason [[Quality]] does: Sampling already depends on TextOps
  * (the cluster-label CTE), so a TextOps→Sampling reference would form an
  * object-initialization cycle where an oracle SQL string interpolates a
  * not-yet-assigned val as `null`.
  */
object Keys {

  /** First 4 md5 hex digits of the key → uniform int in [0, 65536):
    * position() arithmetic runs identically on both engines. */
  def hexBucketSql(key: String): String =
    s"""(position(substr(md5(CAST($key AS VARCHAR)), 1, 1) IN '0123456789abcdef') - 1) * 4096
       |  + (position(substr(md5(CAST($key AS VARCHAR)), 2, 1) IN '0123456789abcdef') - 1) * 256
       |  + (position(substr(md5(CAST($key AS VARCHAR)), 3, 1) IN '0123456789abcdef') - 1) * 16
       |  + (position(substr(md5(CAST($key AS VARCHAR)), 4, 1) IN '0123456789abcdef') - 1)""".stripMargin

  /** Spark side: conv(hex, 16, 10) of the same 4 digits — same VALUE as
    * the oracle's position() arithmetic, idiomatic on each engine. */
  def hexBucketCol(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** 8/1/1 split boundaries over the 65536-bucket space — the SINGLE source
    * for split_assign, split_leakage_safe, decontam, and incremental dedup
    * (both engine sides); rebalancing the split is a one-place edit. */
  val TrainThr = 52429 // 0.8 * 65536
  val ValThr = 58982 // 0.9 * 65536
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.TextOps

/** Bit-identity proof for the native per-row MinHash signature
  * ([[graft.functions.MinhashSigs]]): the narrow-map path that replaced
  * explode + groupBy in the production LSH chain must produce EXACTLY the
  * frame of the groupBy twin (`sigOver(shingles)`) — same docs present,
  * same mh0..mh7 strings — on the real corpus and on the edge cases the
  * filter encodes (docs with < 3 tokens have no signature row). */
class MinhashSigsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("minhash-sigs-spec", cores = 8)

  test("expression equals min(substring(hex(md5),4j+1,4)) per window") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content with its own trigram windows here"),
      (3L, "short one"), // < 3 tokens → empty digest array → empty sigs
      (4L, "a b c")      // exactly one shingle
    ).toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
      graft.functions.MinhashSigs.minhash_sigs(
        graft.functions.ShingleMd5s.shingle_md5s(split(col("text"), " "), 3),
        8).as("ms"))
    val viaSql = df.select(col("doc_id"),
      explode(graft.functions.ShingleMd5s.shingle_md5s(
        split(col("text"), " "), 3)).as("sh"))
      .withColumn("h", lower(hex(col("sh"))))
      .groupBy("doc_id")
      .agg(array((0 until 8).map(j =>
        min(substring(col("h"), 4 * j + 1, 4))): _*).as("ms"))
    val n = native.filter(size(col("ms")) === 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val g = viaSql.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n == g)
    // the short doc is absent from both frames
    assert(!n.contains(3L) && !g.contains(3L))
    assert(n.contains(4L))
  }

  test("production minhashSig frame is bit-identical to the groupBy twin on the corpus") {
    val d = "/root/testdata/sf0.001"
    val fast = TextOps.minhashSig(spark, d)
    val slow = TextOps.minhashSigViaGroupBy(spark, d)
    assert(fast.schema.fieldNames.toSeq == slow.schema.fieldNames.toSeq)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("signature stage is a narrow map: no exchange below the band explode") {
    // the whole point of the native expression — the first shuffle in the
    // LSH chain must be the band-bucket join, not the signature aggregate
    val d = "/root/testdata/sf0.001"
    val plan = TextOps.minhashSig(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"signature stage must not shuffle:\n$plan")
  }
}

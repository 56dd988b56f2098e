package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("similarity-spec", cores = 8)
  val sf = "/root/testdata/sf0.001"

  test("hyperplane signatures deterministic; planes seeded and bounded") {
    val p1 = Similarity.hyperplaneSignature()
    val p2 = Similarity.hyperplaneSignature()
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.length == 16 && p1.forall(_.length == 64))
    assert(p1.flatten.forall(v => v > -1.0 && v < 1.0))
    assert(Similarity.hyperplaneSignature(seed = 7L).head.toSeq != p1.head.toSeq)
  }

  test("LSH bucket assignment deterministic and well-formed") {
    val a = Similarity.simLshBuckets.fn(spark, sf).collect()
    val b = Similarity.simLshBuckets.fn(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == Tables.embeddings(spark, sf).count())
    a.foreach { r =>
      val bucket = r.getAs[Int]("bucket")
      assert(bucket >= 0 && bucket < (1 << 16))
    }
    // buckets actually partition the space (not all vectors in one bucket)
    assert(a.map(_.getAs[Int]("bucket")).distinct.length > 1)
  }

  test("sign LSH is scale-invariant: v and 2.5·v share a signature") {
    val planes = Similarity.hyperplaneSignature()
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val v = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val scaled = v.map(_ * 2.5f)
      assert(Similarity.signatureOf(v, planes) == Similarity.signatureOf(scaled, planes))
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.ShingleMd5s

/** The native shingle hasher must be indistinguishable (as an equality-key
  * producer) from the declarative form it replaced:
  * `array_distinct(transform(sequence(0, size(t)-n), i ->
  * unhex(md5(concat_ws(' ', slice(t, i+1, n))))))`. */
class ShingleMd5sSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("shingle-md5s-spec", cores = 8)

  private def both(texts: Seq[String], n: Int): Seq[(Seq[Seq[Byte]], Seq[Seq[Byte]])] = {
    import spark.implicits._
    val df = texts.toDF("text").select(split(col("text"), " ").as("t"))
    val declarative = expr(
      s"""CASE WHEN size(t) < $n THEN CAST(array() AS ARRAY<BINARY>)
         |ELSE array_distinct(transform(sequence(0, size(t) - $n),
         |       i -> unhex(md5(concat_ws(' ', slice(t, i + 1, $n)))))) END""".stripMargin)
    df.select(ShingleMd5s.shingle_md5s(col("t"), n).as("native"),
        declarative.as("decl"))
      .collect()
      .map(r => (r.getSeq[Array[Byte]](0).map(_.toSeq),
        r.getSeq[Array[Byte]](1).map(_.toSeq)))
      .toSeq
  }

  test("digests match the declarative md5-of-concat_ws form, order included") {
    val texts = Seq(
      "a b c d e",
      "one two three",
      "dup dup dup dup dup", // windows collapse to one distinct digest
      "x y",                 // shorter than the window → empty
      "",                    // single empty token → empty at n=3
      "Ünïcode tökens ärê bytes tòo")
    both(texts, 3).foreach { case (native, decl) =>
      assert(native == decl)
    }
  }

  test("window count and distinctness on a long synthetic doc") {
    val t = (1 to 500).map(i => s"tok${i % 40}").mkString(" ")
    val Seq((native, decl)) = both(Seq(t), 8)
    assert(native == decl)
    assert(native.size == native.distinct.size)
  }

  test("multiplicity mode keeps every window in position order") {
    import spark.implicits._
    val df = Seq("a b a b a").toDF("text")
      .select(split(col("text"), " ").as("t"))
    val decl = df.select(expr(
      "transform(sequence(1, size(t) - 1), i -> unhex(md5(concat(t[i - 1], ' ', t[i]))))")
      .as("d")).collect().head.getSeq[Array[Byte]](0).map(_.toSeq)
    val native = df.select(ShingleMd5s.shingle_md5s(col("t"), 2, distinct = false)
      .as("n")).collect().head.getSeq[Array[Byte]](0).map(_.toSeq)
    assert(native == decl)              // 4 windows: ab ba ab ba
    assert(native.size == 4 && native.distinct.size == 2)
  }

  test("parity on real corpus text at n=3 and n=8") {
    import spark.implicits._
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toSeq
    Seq(3, 8).foreach { n =>
      both(texts, n).foreach { case (native, decl) => assert(native == decl) }
    }
  }
}

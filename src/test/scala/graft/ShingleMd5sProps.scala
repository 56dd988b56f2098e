package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.ShingleMd5s

/** Property-based parity for the native shingle hasher against an
  * independent reference implementation (md5 of the space-joined window
  * string), across both modes, random window sizes, and unicode tokens —
  * the digest contract ShingleMd5s' Scaladoc promises, checked without
  * Spark in the loop. */
object ShingleMd5sProps extends Properties("ShingleMd5s") {

  private val genToken: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const(""),
    Gen.const("tök"),      // multi-byte UTF-8
    Gen.const("字 字"),     // token containing the join separator itself
    Gen.const("a"))

  private val genTokens: Gen[List[String]] = for {
    n <- Gen.choose(0, 30)
    toks <- Gen.listOfN(n, genToken)
  } yield toks

  private def reference(toks: Seq[String], n: Int,
      distinct: Boolean): Seq[Seq[Byte]] = {
    if (toks.length < n) Seq.empty
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val windows = toks.sliding(n)
        .map(w => md.digest(w.mkString(" ").getBytes("UTF-8")).toSeq).toSeq
      if (distinct) windows.distinct else windows
    }
  }

  property("digest parity with md5(space-joined window), both modes, order included") =
    forAll(genTokens, Gen.choose(1, 5), Gen.oneOf(true, false)) { (toks, n, distinct) =>
      val expr = ShingleMd5s(Literal(null, ArrayType(StringType)), n, distinct)
      val input = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val out = expr.compute(input)
      val got = (0 until out.numElements()).map(i => out.getBinary(i).toSeq)
      got == reference(toks, n, distinct)
    }
}

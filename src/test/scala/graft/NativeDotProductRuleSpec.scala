package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.DotProduct
import graft.plans.NativeDotProductRule

/** The fold→native optimizer rewrite: `aggregate(zip_with(a,b,x*y),0,+)`
  * becomes the codegen'd DotProduct expression, bit-preserving. */
class NativeDotProductRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("dot-rule-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  private val foldSql =
    "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("rule rewrites the canonical fold to the native expression") {
    val df = Tables.embeddings(spark, sf).selectExpr(s"$foldSql AS n2")
    val rewritten = NativeDotProductRule(df.queryExecution.optimizedPlan)
    val hasNative = rewritten.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
    assert(hasNative, s"no DotProduct after rewrite:\n$rewritten")
  }

  test("rule leaves a FLOAT-typed multiply alone (different rounding bits)") {
    // no double cast: products round to float first — must NOT be rewritten
    val df = Tables.embeddings(spark, sf).selectExpr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS n2")
    val rewritten = NativeDotProductRule(df.queryExecution.optimizedPlan)
    assert(!rewritten.expressions.exists(_.exists(_.isInstanceOf[DotProduct])))
  }

  test("rewritten plan executes and agrees bit-for-bit with the unoptimized fold") {
    val base = Tables.embeddings(spark, sf)
    val expected = base.selectExpr("vec_id", s"$foldSql AS n2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeDotProductRule
    try {
      val df = base.selectExpr("vec_id", s"$foldSql AS n2")
      df.collect() // force planning + execution with the rule active
      val plan = df.queryExecution.optimizedPlan
      assert(plan.expressions.exists(_.exists(_.isInstanceOf[DotProduct])),
        s"rule did not fire in session optimizer:\n$plan")
      df.collect().foreach(r => assert(r.getDouble(1) == expected(r.getLong(0))))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == NativeDotProductRule)
    }
  }
}

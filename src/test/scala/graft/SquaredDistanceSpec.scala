package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.SquaredDistance.squared_distance

class SquaredDistanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("sqdist-spec", cores = 8)
  val sf = "/root/testdata/sf0.001"

  private val foldSql =
    "aggregate(zip_with(a, b, (x, c) -> (CAST(x AS DOUBLE) - CAST(c AS DOUBLE)) * " +
      "(CAST(x AS DOUBLE) - CAST(c AS DOUBLE))), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("bit-identical to the aggregate(zip_with(...)) fold on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("embedding").as("a"), col("qv").as("b"))
      .select(
        squared_distance(col("a"), col("b")).as("native"),
        expr(foldSql).as("fold"))
    // bit-level agreement, not epsilon: same IEEE op sequence
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("null array → null; mismatched lengths → null (zip_with null-pad semantics)") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 6.0f))),        // 4 + 16 = 20
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f, 99.0f))), // pad → null
      (None: Option[Seq[Float]], Some(Seq(1.0f))))
      .toDF("a", "b")
    val out = df.select(squared_distance($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 20.0)
    assert(out(1).isNullAt(0), "length mismatch must match the fold's null")
    assert(out(2).isNullAt(0))
    val fold = df.selectExpr(s"$foldSql AS f").collect()
    assert(fold(1).isNullAt(0))
  }

  test("stays in whole-stage codegen over a real scan") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = emb.crossJoin(broadcast(q))
      .select(squared_distance(col("embedding"), col("qv")).as("d2"))
      .filter(col("d2") >= 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"fell out of codegen:\n$plan")
  }

  test("optimizer rule rewrites the declarative squared-distance fold to the native expression") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("b"))
    val df = emb.crossJoin(broadcast(q)).withColumnRenamed("embedding", "a")
      .selectExpr("vec_id", s"$foldSql AS d2")
    val rewritten = graft.plans.NativeDotProductRule(df.queryExecution.optimizedPlan)
    assert(rewritten.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.SquaredDistance])),
      s"no SquaredDistance after rewrite:\n$rewritten")
    // and the rewrite is value-preserving: native vs plain fold, bit-level
    val expected = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), squared_distance(col("embedding"), col("b")).as("d2"))
      .collect()
    native.foreach(r => assert(r.getDouble(1) == expected(r.getLong(0))))
  }
}

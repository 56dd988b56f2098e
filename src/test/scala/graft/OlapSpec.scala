package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

class OlapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("olap-spec", cores = 8)
  val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) within 5% of exact — the 100 TB distinct path") {
    val r = Tables.lineitem(spark, sf).agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_tight")).collect().head
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.05)
    assert(math.abs(r.getLong(2) - exact) / exact < 0.02)
  }

  test("as-of join: no order loses rows; misses carry null (left-outer semantics)") {
    val out = SparkEntry.queries("olap_asof_join")(spark, sf)
    val n = Tables.orders(spark, sf).count()
    assert(out.count() == n, "as-of join must preserve every left row")
    // schema: orderkey + nullable last_event_ns
    assert(out.columns.toSeq == Seq("o_orderkey", "last_event_ns"))
  }

  test("rollup produces per-group, subtotal, and grand-total strata") {
    val out = SparkEntry.queries("olap_rollup")(spark, sf).collect()
    assert(out.exists(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")) // grand total
    assert(out.exists(r => r.getString(0) != "(all)" && r.getString(1) == "(all)")) // subtotal
    assert(out.exists(r => r.getString(0) != "(all)" && r.getString(1) != "(all)")) // leaf
    // grand total n equals the sum of leaf n
    val leaves = out.filter(r => r.getString(0) != "(all)" && r.getString(1) != "(all)")
    val grand = out.find(r => r.getString(0) == "(all)" && r.getString(1) == "(all)").get
    assert(leaves.map(_.getAs[Long]("n")).sum == grand.getAs[Long]("n"))
  }
}

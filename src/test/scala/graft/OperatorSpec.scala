package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Smoke-level regression: every declared query runs and yields rows at
  * sf0.001 (value-level correctness is the DuckDB oracle gate, driven by
  * graft.Verify + tools/check.py). */
class OperatorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("operator-spec", cores = 8)
  val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry integrity: query names are unique (toMap would silently drop a duplicate)") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(names.size == SparkEntry.queries.size)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs and returns rows") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }
}

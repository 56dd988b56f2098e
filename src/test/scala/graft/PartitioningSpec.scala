package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Partitioned layout + partition pruning, and salting for skewed joins —
  * the two remaining 100 TB layout patterns (builder prompt): a partition
  * filter must prune directories at plan time, and a salted join must be
  * result-identical to the plain join while splitting hot keys.
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.localSession("partitioning-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("partitionBy write + filter → partition pruning at the scan") {
    val dir = Files.createTempDirectory("ev-part").toString
    Tables.events(spark, sf).drop("ts") // raw ts layout-dependent; canonical cols stay
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), "no partition filters in scan")
    assert(plan.contains("event_type"), "partition column not in pruning filter")
    // pruned scan must read strictly fewer files than the full table
    val all = spark.read.parquet(dir)
    val nTypes = all.select("event_type").distinct().count()
    assert(nTypes > 1)
    assert(one.count() > 0 && one.count() < all.count())
  }

  test("salted join result-identical to plain join on a skewed key") {
    import spark.implicits._
    val salts = 8
    // skewed fact: 90% of rows share key 1
    val fact = spark.range(0, 20000)
      .select((when(col("id") % 10 =!= 0, 1L).otherwise(col("id"))).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("v"))

    val plain = fact.join(dim, "k").agg(sum("v"), count(lit(1))).collect()

    // salt: fact rows get a deterministic salt from a non-key column;
    // dim rows are replicated across all salt values
    val factS = fact.withColumn("salt", pmod(xxhash64(col("payload")), lit(salts)))
    val dimS = dim.crossJoin(
      spark.range(0, salts).select(col("id").cast("int").as("salt")))
    val salted = factS.join(dimS, Seq("k", "salt"))
      .agg(sum("v"), count(lit(1))).collect()

    assert(plain.map(_.toString).toSeq == salted.map(_.toString).toSeq)
  }

  test("GraftExtensions registers native functions via injectFunction") {
    val ext = new graft.functions.GraftExtensions
    ext(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
    // end-to-end registration path is covered by HammingDistanceSpec's
    // FunctionRegistry test; extensions share the same builder
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryDef
import graft.operators.{Multimodal, Olap, Pipelines, Relational, Sampling, Similarity, TextOps, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface; each entry with an
  * `oracleSql` twin is hash-compared against DuckDB on the same parquet
  * tables (sf0.01). Entries without oracle SQL get a rows-only check.
  */
object SparkEntry {

  /** All registered query definitions, grouped by module. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ TextOps.defs ++ Similarity.defs ++ Pipelines.defs ++
      Multimodal.defs ++ Olap.defs ++ Sampling.defs ++ TpchShapes.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Contract (see the builder prompt): column names AND order-insensitive
  * values must match the oracle exactly — every computed column is aliased
  * identically on both sides, and computed doubles are rounded to 4 dp
  * (the synthetic data's true decimal precision is <= 4 dp, so 4-dp
  * rounding absorbs float accumulation-order noise without ever landing on
  * a rounding boundary).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), fn)
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, fn)
}

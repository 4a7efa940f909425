package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: a Spark implementation plus (where
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Oracle-less entries get the driver's weaker rows-only check.
  *
  * Column names of the Spark result and the oracle MUST match — the
  * driver's compare sorts columns by name before hashing values.
  */
final case class GQ(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object GQ {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): GQ = GQ(fn, Some(sql))
}

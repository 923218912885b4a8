package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator: a Spark query over the fixture tables
  * plus (when SQL-expressible) an equivalent DuckDB oracle query. Queries
  * without an oracle get the driver's weaker rows-only check.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

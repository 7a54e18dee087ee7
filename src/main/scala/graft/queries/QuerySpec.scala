package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: the Spark builder plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Queries
  * without an oracle get the driver's weaker rows-only check. */
final case class QuerySpec(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Extensions, Parity, QuerySpec}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the extension operators)
  * is exposed as a named query; SQL-expressible ones carry a DuckDB oracle
  * twin with IDENTICAL output column names (the driver's compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** All registered query specs, in declaration order. */
  def specs: Seq[QuerySpec] = Parity.specs ++ Extensions.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.totals(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops (rows-only check). */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface beyond the testdata parquet (SURVEY §2.1 S1/S4:
  * the reference's sources are Postgres tables read over JDBC and ClickHouse
  * tables written over native TCP; this engine's equivalents are format-
  * pluggable DataFrame readers/writers).
  *
  * Every reader takes an EXPLICIT schema: at 100 TB, schema inference is a
  * full extra pass over the data (CSV/JSON infer by sampling every file),
  * and a silently widened column poisons every downstream cast. Explicit
  * schemas also keep column pruning exact for columnar formats.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JDBC reader configured for parallel extraction: `partitionColumn` +
    * bounds split the table into `numPartitions` range-predicate queries so
    * the scan runs on all executors instead of one connection (the
    * reference's single-cursor fetchall, initial_load…py:233, is the
    * anti-pattern this replaces). This is the live-Postgres parity path;
    * SourcesSpec proves the partitioned-extraction configuration against
    * embedded Derby (the one JDBC engine on the offline classpath). */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}

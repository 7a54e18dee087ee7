package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata parquet tables (TESTDATA.md).
  *
  * At 100 TB these reads stay scan-shaped: column pruning and predicate
  * pushdown reach the parquet reader because every downstream op selects
  * explicit columns / filters before any shuffle (verify via
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else raw(spark, dir, name)

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy conf) and
    * convert with integer division — ns→µs truncation, the same conversion
    * DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP. Integer `div`
    * (not `/`) because ns-since-epoch exceeds double's 2^53 exact range. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view so `spark.sql` parity queries and
    * ad-hoc exploration see the same catalog names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}

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

  /** events.ts normalized to session-tz TimestampType regardless of how
    * the parquet file encodes it — the physical type has CHANGED across
    * driver testdata generations (TIMESTAMP(NANOS) through round 6,
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) = TIMESTAMP_NTZ since),
    * and a conversion hard-wired to one encoding broke 7 queries when
    * the other appeared. Dispatch on the type Spark actually inferred:
    *  - LongType (nanos via the legacy conf, which rejects NANOS
    *    otherwise): ns→µs integer `div` truncation, the same conversion
    *    DuckDB applies casting TIMESTAMP_NS→TIMESTAMP; `div` not `/`
    *    because ns-since-epoch exceeds double's 2^53 exact range.
    *  - TimestampNTZType: cast to TimestampType — wall-clock-preserving
    *    under the UTC session tz, matching DuckDB's naive TIMESTAMP.
    *  - TimestampType: already what every downstream query expects. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` parity queries and
    * ad-hoc exploration see the same catalog names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}

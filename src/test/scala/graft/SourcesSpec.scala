package graft

import graft.ops.Joins
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source round-trips (explicit-schema CSV/JSON/parquet) and the salted
  * skew-safe join's equivalence to a plain join. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 1.5), (2L, "beta", 2.25), (3L, "gamma", -0.75)
  ).toDF("id", "name", "score")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  test("csv round-trips with explicit schema") {
    val p = tmp("graft-csv")
    df.write.option("header", "true").csv(p)
    assertSameRows(Sources.csv(spark, p, schema), df, "csv")
  }

  test("json round-trips with explicit schema") {
    val p = tmp("graft-json")
    df.write.json(p)
    assertSameRows(Sources.json(spark, p, schema), df, "json")
  }

  test("parquet round-trips") {
    val p = tmp("graft-parquet")
    df.write.parquet(p)
    assertSameRows(Sources.parquet(spark, p), df, "parquet")
  }

  test("salted join equals plain join, including skewed and absent keys") {
    // key 1 is hot (100 rows), key 9 has no match on the right
    val left = spark.range(0, 100).select(lit(1L).as("k"), col("id").as("v"))
      .union(Seq((2L, -1L), (9L, -2L)).toDF("k", "v"))
    val right = Seq((1L, "hot"), (2L, "cold"), (3L, "unused"))
      .toDF("k", "tag")
    val plain = left.join(right, Seq("k"))
    val salted = Joins.saltedJoin(left, right, Seq("k"), salt = 4)
    assertSameRows(salted, plain, "salted vs plain")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated TPC-H-ish fixtures.
  *
  * Scans stay plain `spark.read.parquet` so Catalyst pushes filters and
  * prunes columns at the source (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS). Spark reads it as a nanos
    * long (spark.sql.legacy.parquet.nanosAsLong); normalize to a
    * microsecond TimestampType column exactly as DuckDB truncates
    * nanos→micros, so oracle comparisons line up.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      // integer division — `/` on longs is double division and loses
      // precision above 2^53 (these are epoch-nanos, ~1.7e18)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}

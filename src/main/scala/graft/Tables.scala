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

  /** `events.ts` normalization across fixture generations: OLDER
    * driver fixtures carried parquet TIMESTAMP(NANOS) — read as a
    * nanos long (spark.sql.legacy.parquet.nanosAsLong) and truncated
    * to microseconds exactly as DuckDB does; CURRENT fixtures carry
    * TIMESTAMP(MICROS), which takes the pass-through branch. Both
    * reader flags are set DEFENSIVELY here because this method is the
    * events entry point for driver-built sessions that didn't come
    * through GraftSession: on Spark 4 the micros fixtures would
    * otherwise infer TIMESTAMP_NTZ (inferTimestampNTZ defaults true),
    * breaking epoch casts and streaming watermarks — that flag, not
    * nanosAsLong, is the load-bearing one for the current files.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = apply(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      // integer division — `/` on longs is double division and loses
      // precision above 2^53 (these are epoch-nanos, ~1.7e18)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}

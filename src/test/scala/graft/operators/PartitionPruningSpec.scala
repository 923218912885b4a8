package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-layout scale artifact: a predicate on the partition column
  * must prune directories at planning time (PartitionFilters on the
  * scan), so a 100 TB table queried for one day/type reads one
  * partition's files, not the table.
  */
class PartitionPruningSpec extends SparkSpec {

  test("hive-style partitioned write → partition-pruned scan") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.events(s, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
    events.write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$dir/events_by_type")

    val one = s.read.parquet(s"$dir/events_by_type")
      .filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    // pruning happens in the scan's PartitionFilters, not a Filter node
    assert(plan.contains("PartitionFilters"), plan)
    assert(
      plan.replaceAll("\\s+", " ")
        .matches(".*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"), plan)

    // count matches the unpartitioned filter, and the scan touched only
    // the one partition directory
    val expected = events.filter(col("event_type") === "click").count()
    assert(one.count() == expected)
    val scannedDirs = new java.io.File(s"$dir/events_by_type")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(scannedDirs.contains("event_type=click"))
    assert(scannedDirs.size > 1) // other partitions exist and were skipped
  }
}

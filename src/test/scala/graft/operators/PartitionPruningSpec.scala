package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-layout scale artifact: a predicate on the partition column
  * must prune directories at planning time (PartitionFilters on the
  * scan), so a 100 TB table queried for one day/type reads one
  * partition's files, not the table.
  */
class PartitionPruningSpec extends SparkSpec {

  // single source of truth for the fixture path: the scoped-scratch
  // assertions below must derive from the SAME dir the queries ran
  // against (ADVICE r11 — a hardcoded copy diverges silently if the
  // fixture path changes)
  private val sfDir = "/root/testdata/sf0.001"

  test("hive-style partitioned write → partition-pruned scan") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.events(s, sfDir)
      .withColumn("day", to_date(col("ts")))
    events.write.mode("overwrite")
      .partitionBy("day", "event_type").parquet(s"$dir/events_by_type")

    val one = s.read.parquet(s"$dir/events_by_type")
      .filter(col("event_type") === "click" && col("day") === "2024-01-02")
    val plan = one.queryExecution.executedPlan.toString
    // pruning happens in the scan's PartitionFilters (planning-time
    // directory pruning), not a post-scan Filter node — BOTH partition
    // columns must appear there
    val flat = plan.replaceAll("\\s+", " ")
    assert(flat.matches(".*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"), plan)
    assert(flat.matches(".*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"), plan)

    // result matches the unpartitioned filter
    val expected = events
      .filter(col("event_type") === "click" && col("day") === "2024-01-02").count()
    assert(expected > 0 && one.count() == expected)
    // layout sanity: many day partitions exist for the scan to skip
    val dayDirs = new java.io.File(s"$dir/events_by_type")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dayDirs.contains("day=2024-01-02") && dayDirs.size > 1)
  }

  test("q60's year predicate prunes partitions at the scan") {
    val s = spark
    val q = graft.SparkEntry
      .queries("q60_partition_pruned")(s, sfDir)
    val flat = q.queryExecution.executedPlan.toString.replaceAll("\\s+", " ")
    // the o_year filter must land in PartitionFilters (directory
    // pruning at planning time), not a post-scan Filter
    assert(flat.matches(".*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"), flat)
    // and the layout must actually be partitioned: multiple year dirs
    // (scratch paths are keyed per input dataset since r11)
    val yearDirs = new java.io.File(Relational.scoped(Relational.partitionedDir, sfDir))
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(yearDirs.contains("o_year=1996") && yearDirs.size > 1, yearDirs.toString)
  }

  test("q205's dim join prunes fact partitions DYNAMICALLY") {
    val s = spark
    val q = graft.SparkEntry
      .queries("q205_dynamic_partition_pruning")(s, sfDir)
    val flat = q.queryExecution.executedPlan.toString.replaceAll("\\s+", " ")
    // the fact scan's PartitionFilters must carry a dynamicpruning
    // subquery (runtime directory pruning from the joined dim), not a
    // literal — that is the difference from q60's static case
    assert(flat.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan: $flat")
    // and the layout offers >2 year dirs for the dim to prune down to 2
    val yearDirs = new java.io.File(Relational.scoped(Relational.dppDir, sfDir))
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(yearDirs.size > 2, yearDirs.toString)
  }
}

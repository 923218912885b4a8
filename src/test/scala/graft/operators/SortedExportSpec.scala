package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale artifact of q73's range-sorted export: the output files must
  * cover DISJOINT key ranges (that disjointness is what lets parquet
  * min/max zone-maps skip whole files on a range predicate), and rows
  * inside each file must be sorted. A plain repartition+sort would pass
  * content equality but produce overlapping files — this spec is what
  * tells them apart.
  */
class SortedExportSpec extends SparkSpec {

  test("range-partitioned export: files cover disjoint, sorted key ranges") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    graft.Tables(s, "/root/testdata/sf0.001", "orders")
      .repartitionByRange(8, col("o_orderdate"), col("o_orderkey"))
      .sortWithinPartitions("o_orderdate", "o_orderkey")
      .write.mode("overwrite").parquet(dir)

    // per-file min/max of the leading sort key (as ISO strings — same
    // total order as the timestamp), via input_file_name — exactly the
    // zone-map information a scan would consult
    val ranges = s.read.parquet(dir)
      .select(input_file_name().as("f"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("d"))
      .groupBy("f").agg(min("d").as("lo"), max("d").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

    assert(ranges.length > 1, "expected a multi-file export")
    assert(ranges.map(_._3).sum ==
      graft.Tables(s, "/root/testdata/sf0.001", "orders").count())
    // "every file's lo >= previous file's hi" would be too strict at
    // range boundaries (a boundary value may straddle two files when
    // the tie-break key splits it) — assert overlaps are confined to a
    // single boundary value
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, hi2, _)) =>
        assert(hi1 <= hi2, s"file ranges out of order: $hi1 > $hi2")
        assert(lo2 >= hi1, s"file ranges overlap beyond a boundary value: lo=$lo2 < prev hi=$hi1")
      case _ => ()
    }

    // rows inside each file are sorted on the leading key: per-file,
    // the sequence of dates in file order must be non-decreasing
    // (monotonically_increasing_id is partition-prefixed and ascending
    // within a partition, so it preserves within-file row order)
    val unsortedFiles = s.read.parquet(dir)
      .select(input_file_name().as("f"), col("o_orderdate").as("d"),
        monotonically_increasing_id().as("seq"))
      .withColumn("prev_d",
        lag("d", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("f").orderBy("seq")))
      .where(col("prev_d") > col("d"))
      .count()
    assert(unsortedFiles == 0L, "found out-of-order rows inside an exported file")
  }

  test("z-order export: per-file ranges stay narrow on BOTH dimensions") {
    val s = spark
    // drive the REAL q88 (not a re-implementation): its side effect is
    // the z-ordered export at Relational.zorderDir (pid-scoped scratch,
    // shutdown-hook cleaned), which is what this spec inspects
    graft.SparkEntry.queries("q88_zorder_layout")(s, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    val dir = Relational.scoped(Relational.zorderDir, "/root/testdata/sf0.001")
    val li = graft.Tables(s, "/root/testdata/sf0.001", "lineitem")

    // Per-file (min,max) of each dimension — the zone maps a 2-D
    // predicate scan consults. A single-column sort keeps the FIRST
    // dimension narrow and leaves the second at ~full span per file;
    // the z-curve must keep the AVERAGE span fraction of BOTH below
    // what any 1-D layout can deliver on its non-sort dimension.
    val stats = s.read.parquet(dir)
      .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"))
      .groupBy("f")
      .agg(
        min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
      .collect()
    assert(stats.length > 1, "expected a multi-file export")
    val Array(pGlob, sGlob) = li
      .agg(
        (max("l_partkey") - min("l_partkey")).cast("double"),
        (max("l_suppkey") - min("l_suppkey")).cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    def frac(lo: Any, hi: Any, glob: Double): Double =
      (hi.toString.toDouble - lo.toString.toDouble) / glob
    val pAvg = stats.map(r => frac(r(1), r(2), pGlob)).sum / stats.length
    val sAvg = stats.map(r => frac(r(3), r(4), sGlob)).sum / stats.length
    assert(pAvg < 0.7, f"partkey per-file span fraction $pAvg%.2f — not clustered")
    assert(sAvg < 0.7, f"suppkey per-file span fraction $sAvg%.2f — not clustered")
  }

  test("q90 compaction: 64 fragments merge to the computed file count, rows intact") {
    val s = spark
    val n = graft.SparkEntry.queries("q90_compact_files")(s, "/root/testdata/sf0.001").count()
    assert(n == graft.Tables(s, "/root/testdata/sf0.001", "orders").count())
    def parquetFiles(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(Relational.scoped(Relational.fragmentedDir, "/root/testdata/sf0.001")) == 64)
    // sf0.001 orders ≈ a few hundred KB: one 32 MB-target file
    assert(parquetFiles(Relational.scoped(Relational.compactedDir, "/root/testdata/sf0.001")) == 1,
      s"expected a single compacted file")
  }
}

package graft.operators

import graft.{SparkEntry, SparkSpec}

/** The non-splittability contract behind q03g's layout rule: a gzip
  * text source yields exactly one input partition per .gz file — no
  * matter the file size — so parallelism is decided at WRITE time by
  * the file count. (Parquet from the same data splits by row group
  * instead, which is why columnar formats don't carry this rule.)
  */
class GzipSourceSpec extends SparkSpec {

  test("gzip text read parallelism == file count, and the round trip is lossless") {
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q03g_gzip_roundtrip")(spark, sfDir)
    // the write produced 4 .gz parts; the read must plan exactly 4
    // partitions — gzip cannot split. The scoped scratch path derives
    // from the SAME sfDir the query ran against (ADVICE r11: a
    // hardcoded copy here would inspect a different dataset's dir if
    // the fixture path ever changed).
    val gzDir = new java.io.File(Relational.scoped(Relational.gzipRoundtripDir, sfDir))
    val nFiles = gzDir.listFiles().count(_.getName.endsWith(".gz"))
    assert(nFiles == 4, s"expected 4 gz parts, found $nFiles")
    val parts = spark.read.text(Relational.scoped(Relational.gzipRoundtripDir, sfDir)).rdd.getNumPartitions
    assert(parts == nFiles, s"gzip read planned $parts partitions for $nFiles files")
    // lossless: same rows as the source projection
    val src = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    assert(out.count() == src.count())
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
  }
}

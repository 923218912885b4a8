package graft.pipeline

import graft.SparkSpec

/** K2 sink parity: the reference writes its TSV output 8-way
  * (`PipeLine.scala:36-37`, artifact `pipeline/output/text.txt/1..8`).
  * writeOutput must do the same — multiple part files whose combined
  * content is the full result — instead of serializing everything
  * through a single coalesce(1) task.
  */
class OutputSinkSpec extends SparkSpec {

  test("writeOutput emits multi-part TSV with unchanged combined content") {
    val s = spark; import s.implicits._
    val rows = (0 until 1000).map(i => (s"sample_$i", i.toDouble))
    val df = rows.toDF("sample_name", "prediction").repartition(32)
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val out = s"$dir/preds_%s%"
    LuadPipeline.writeOutput(df, Some(out))

    val written = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(written.length == 1, "one output dir, %s% resolved to epoch millis")
    assert(!written.head.getName.contains("%s%"))
    val partFiles = written.head.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    // 32 input partitions coalesced to the reference's 8-way layout
    assert(partFiles.length == 8, s"expected 8 part files, got ${partFiles.length}")

    val got = partFiles.flatMap { f =>
      scala.io.Source.fromFile(f).getLines().toSeq
    }.toSet
    val want = rows.map { case (n, p) => s"$n\t$p" }.toSet
    assert(got == want, "combined part-file content must equal the result")
  }

  test("writeOutput never fans a small result out past its own partitioning") {
    val s = spark; import s.implicits._
    // 2 rows → at most 2 source partitions; the parts=8 cap must not
    // manufacture extra (empty) part files beyond them. (An inner
    // coalesce(1) would be collapsed into writeOutput's coalesce by
    // Catalyst's CollapseRepartition, so the source partitioning is
    // the real floor.)
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("sample_name", "prediction")
    val dir = java.nio.file.Files.createTempDirectory("graft_sink1").toString
    LuadPipeline.writeOutput(df, Some(s"$dir/out"))
    val partFiles = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(partFiles.length <= 2, partFiles.map(_.getName).mkString(","))
    val got = partFiles.flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq).toSet
    assert(got == Set("a\t1.0", "b\t2.0"))
  }
}

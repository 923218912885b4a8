package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the streaming module's time-precision
  * convention (VERDICT r10 #2 — r9's oracle-convention lesson applied
  * one module over): the events fixture carries MICROSECOND timestamps
  * (Tables.scala timestamp_micros) while `java.sql.Timestamp.getTime`
  * truncates to milliseconds, so any replay ordering or keep-latest
  * state key built on `.getTime` silently diverges from its batch twin
  * when two events land inside one millisecond — exactly how the r9
  * ewma/attribution defect recurred in r10's upsertStream. The module
  * header (`Streams.scala` `tsMicros`) states the rule; this spec
  * ENFORCES it the way OracleConventionSpec enforces the batch-oracle
  * conventions: walk every non-comment line of `streaming/` main
  * sources and fail on millisecond-truncating accessors. Exemptions
  * must be written here with a reason, not waved through.
  */
class StreamingConventionSpec extends AnyFunSuite {

  /** Millisecond-truncating patterns banned on state/sort paths: every
    * accessor spelling, not just the java.sql one (r13 gate-instrument
    * review — a java.time refactor would have reintroduced the
    * truncation via toEpochMilli with the old two-entry list green).
    * Any legitimate wall-clock use (there is none today) gets a written
    * exemption below, keyed by (file, substring-of-line).
    */
  private val banned = Seq(
    ".getTime", "System.currentTimeMillis", ".toEpochMilli",
    "Clock.millis", "unix_millis(", ".getMillis")

  private val exemptions: Set[(String, String)] = Set.empty

  test("streaming main sources never truncate event time to milliseconds") {
    // recursive + comment-aware (ConventionScan): a flat listFiles()
    // skipped any future subpackage; the old stripper skipped live
    // code sharing a line with a block comment
    val files = graft.ConventionScan.scalaFiles("src/main/scala/graft/streaming")
    assert(files.nonEmpty, "no streaming sources — path convention changed?")
    val hits = files.flatMap { f =>
      val lines = graft.ConventionScan.codeLines(f)
      lines.indices.flatMap { i =>
        val code = lines(i)
        banned.filter(code.contains).map(b => (f.getName, i + 1, code.trim, b))
      }
    }.filterNot { case (file, _, line, _) =>
      exemptions.exists { case (ef, es) => ef == file && line.contains(es) }
    }
    assert(
      hits.isEmpty,
      "millisecond-truncating time accessors on streaming code paths " +
        "(use tsMicros / unix_micros — see Streams.scala header):\n" +
        hits.map { case (f, n, l, b) => s"  $f:$n [$b] $l" }.mkString("\n"))
  }
}

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

  /** Millisecond-truncating patterns banned on state/sort paths. Any
    * legitimate wall-clock use (there is none today) gets a written
    * exemption below, keyed by (file, substring-of-line).
    */
  private val banned = Seq(".getTime", "System.currentTimeMillis")

  private val exemptions: Set[(String, String)] = Set.empty

  test("streaming main sources never truncate event time to milliseconds") {
    val dir = new java.io.File("src/main/scala/graft/streaming")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".scala")).sortBy(_.getName)
    assert(files.nonEmpty, s"no streaming sources under $dir — path convention changed?")
    val hits = files.toSeq.flatMap { f =>
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      (0 until lines.size).flatMap { i =>
        val raw = lines.get(i)
        val trimmed = raw.trim
        // strip scaladoc/block-comment lines and trailing // comments:
        // the convention is about CODE, and the docs legitimately name
        // getTime to warn against it
        val code =
          if (trimmed.startsWith("*") || trimmed.startsWith("/*")) ""
          else raw.split("//", 2).head
        banned.filter(code.contains).map(b => (f.getName, i + 1, raw.trim, b))
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

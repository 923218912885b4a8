package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the scratch-directory convention (the q205
  * interleaved-run race, r11): every write-then-read query that uses a
  * pid-scoped `roundtripDir` scratch val must ALSO key the path by its
  * input dataset — two runs over different sf dirs that interleave
  * (parallel suites, bench vs verify) must never overwrite each other
  * between the write and the read. Enforced the way
  * Streaming/OracleConventionSpec enforce their conventions: walk the
  * non-comment lines of `operators/` main sources and fail on any use
  * of a scratch val that is neither its definition nor dataset-keyed
  * via `Relational.scoped(...)` / `Relational.datasetKey(...)` — the
  * bare `new java.io.File(dir).getName` idiom is NOT accepted: the
  * basename alone collides for same-named datasets under different
  * parents (e.g. /data/a/sf0.1 vs /data/b/sf0.1), recreating the
  * race; datasetKey appends a canonical-path hash. Exemptions are
  * written here with a reason.
  */
class ScratchConventionSpec extends AnyFunSuite {

  /** (file, substring-of-line) pairs explicitly allowed. */
  private val exemptions: Set[(String, String)] = Set(
    // q33f keys by `base`, defined one line above as
    // `Relational.datasetKey(dir)` — same keying, two lines
    ("MultimodalOps.scala", "s\"$pngDir/${base}_files\""))

  test("every scratch-dir use is keyed by the input dataset") {
    val dir = new java.io.File("src/main/scala/graft/operators")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".scala")).sortBy(_.getName)
    assert(files.nonEmpty, s"no operator sources under $dir")
    val sources = files.toSeq.map { f =>
      f.getName -> java.nio.file.Files.readAllLines(f.toPath)
    }
    // collect the scratch vals: `lazy val <name>Dir = ... roundtripDir(`
    val defRe = """lazy val (\w+Dir)\s*(?::\s*String)?\s*=.*roundtripDir\(""".r
    val scratchVals = sources.flatMap { case (_, lines) =>
      (0 until lines.size).flatMap(i =>
        defRe.findFirstMatchIn(lines.get(i)).map(_.group(1)))
    }.toSet
    assert(scratchVals.size >= 15, s"scratch-val discovery broke: $scratchVals")

    val hits = sources.flatMap { case (name, lines) =>
      (0 until lines.size).flatMap { i =>
        val raw = lines.get(i)
        val trimmed = raw.trim
        val code =
          if (trimmed.startsWith("*") || trimmed.startsWith("/*")) ""
          else raw.split("//", 2).head
        val used = scratchVals.filter(v => code.contains(v))
        val keyed = code.contains("lazy val") || code.contains("scoped(") ||
          code.contains("datasetKey(")
        if (used.nonEmpty && !keyed &&
          !exemptions.exists { case (ef, es) => ef == name && raw.contains(es) })
          Some((name, i + 1, trimmed, used))
        else None
      }
    }
    assert(
      hits.isEmpty,
      "scratch-dir uses not keyed by the input dataset (use " +
        "Relational.scoped or the java.io.File(dir).getName idiom):\n" +
        hits.map { case (f, n, l, vs) => s"  $f:$n ${vs.mkString(",")} $l" }
          .mkString("\n"))
  }
}

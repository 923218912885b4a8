package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the scratch-directory convention (the q205
  * interleaved-run race, r11): every write-then-read query that uses a
  * pid-scoped `roundtripDir` scratch val must ALSO key the path by its
  * input dataset — two runs over different sf dirs that interleave
  * (parallel suites, bench vs verify) must never overwrite each other
  * between the write and the read. Enforced the way
  * Streaming/OracleConventionSpec enforce their conventions: walk the
  * comment-stripped lines of `operators/` main sources and fail on any
  * use of a scratch val that is neither its own definition nor
  * dataset-keyed via `Relational.scoped(<val>, ...)`. The bare
  * `new java.io.File(dir).getName` idiom is NOT accepted: the basename
  * alone collides for same-named datasets under different parents
  * (e.g. /data/a/sf0.1 vs /data/b/sf0.1), recreating the race;
  * datasetKey appends a canonical-path hash. Exemptions are written
  * here with a reason.
  *
  * r13 gate-instrument hardening: checks are PER-VAL, not per-line —
  * a line containing `lazy val` (any val) or a `scoped(` applied to a
  * DIFFERENT val no longer blesses every scratch val on it; val
  * discovery is multiline-tolerant (a scalafmt wrap of a definition no
  * longer hides it); and a completeness identity pins every
  * `roundtripDir(` call site to a discovered `\w+Dir` val, so a
  * differently-named scratch val cannot escape discovery.
  */
class ScratchConventionSpec extends AnyFunSuite {

  /** (file, substring-of-line) pairs explicitly allowed. */
  private val exemptions: Set[(String, String)] = Set(
    // q33f keys by `base`, defined one line above as
    // `Relational.datasetKey(dir)` — same keying, two lines
    ("MultimodalOps.scala", "s\"$pngDir/${base}_files\""))

  test("every scratch-dir use is keyed by the input dataset") {
    val files = graft.ConventionScan.scalaFiles("src/main/scala/graft/operators")
    assert(files.nonEmpty, "no operator sources — path convention changed?")
    val sources = files.map(f => f.getName -> graft.ConventionScan.codeLines(f))

    // scratch-val discovery, multiline-tolerant: the definition's RHS
    // may wrap, so match over the joined source with a bounded gap
    val defRe =
      """lazy val (\w+Dir)\s*(?::\s*String)?\s*=[\s\S]{0,160}?roundtripDir\(""".r
    val defsPerFile = sources.map { case (name, lines) =>
      name -> defRe.findAllMatchIn(lines.mkString("\n")).map(_.group(1)).toSeq
    }
    val scratchVals = defsPerFile.flatMap(_._2).toSet
    assert(scratchVals.size >= 15, s"scratch-val discovery broke: $scratchVals")

    // completeness identity: every roundtripDir( call site must belong
    // to a DISCOVERED val — a wrapped definition or a val named outside
    // the \w+Dir convention would otherwise silently skip all checks
    val callSites = sources.map { case (_, lines) =>
      val joined = lines.mkString("\n")
      "roundtripDir\\(".r.findAllIn(joined).size -
        "def roundtripDir\\(".r.findAllIn(joined).size
    }.sum
    val defCount = defsPerFile.map(_._2.size).sum
    assert(callSites == defCount,
      s"$callSites roundtripDir( call sites but only $defCount discovered " +
        "scratch-val definitions — a scratch val escaped discovery " +
        "(wrapped definition or non-\\w+Dir name); rename it to match " +
        "the convention")

    val hits = sources.flatMap { case (name, lines) =>
      lines.indices.flatMap { i =>
        val code = lines(i)
        val offending = scratchVals.filter { v =>
          code.contains(v) &&
            // not this val's own definition line
            !("\\blazy val\\s+" + v + "\\b").r.findFirstIn(code).isDefined &&
            // not dataset-keyed: scoped(<val>, ...) with optional qualifier
            !("scoped\\(\\s*(?:Relational\\.)?" + v + "\\b").r
              .findFirstIn(code).isDefined &&
            // nor the inline interpolation keying: s"$<val>/...${datasetKey(dir)}..."
            // (the MultimodalOps idiom — same keying, spelled in the path)
            !("\\$" + v + "[^\"]*\\$\\{(?:Relational\\.)?datasetKey\\(").r
              .findFirstIn(code).isDefined
        }
        if (offending.nonEmpty &&
          !exemptions.exists { case (ef, es) => ef == name && code.contains(es) })
          Some((name, i + 1, code.trim, offending))
        else None
      }
    }
    assert(
      hits.isEmpty,
      "scratch-dir uses not keyed by the input dataset (wrap in " +
        "Relational.scoped(<val>, dir)):\n" +
        hits.map { case (f, n, l, vs) => s"  $f:$n ${vs.mkString(",")} $l" }
          .mkString("\n"))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the iterative-DataFrame-loop convention
  * (VERDICT r11 #4 — the convention-spec discipline applied to its
  * last hand-kept recurrence class): every loop-carried DataFrame
  * `var` in main must either
  *
  *   (a) `localCheckpoint` in the reassignment statement — lineage is
  *       truncated every round, so an unbounded loop can't stack N
  *       joins into one plan (the classic iterative-DataFrame pitfall:
  *       analysis time grows superlinearly and the plan eventually
  *       blows the stack), or
  *   (b) run a FIXED small round count (`for (x <- 1 to N)`, N ≤ 6):
  *       a handful of rounds keeps un-checkpointed lineage shallow by
  *       construction (q91/q155's documented reasoning), or
  *   (c) carry a written exemption below naming where the truncation
  *       actually happens.
  *
  * Until this spec the rule was hand-kept discipline across
  * GraphOps / Network — the same class of silent-recurrence risk the
  * oracle-rounding (r10) and streaming-getTime (r11) conventions had
  * before their scanning specs landed.
  *
  * The scanner is itself negative-tested: a synthetic violation must
  * be caught (so a regex rot that blinds the scan fails loudly here,
  * not silently in review).
  */
class IterativeLoopConventionSpec extends AnyFunSuite {

  /** (file name, var name) pairs allowed to reassign a frame inside a
    * loop without a statement-visible localCheckpoint or a fixed small
    * round count. Every entry needs the WHERE of its truncation.
    */
  private val exemptions: Set[(String, String)] = Set(
    // connectedComponentsDF's while loop assigns `labels = next` where
    // `next` is ALREADY the materialized frame: round() returns
    // `materialized.select(...)` of a localCheckpoint it also counts
    // convergence from (Network.scala `val materialized =
    // next.localCheckpoint()`) — checkpoint-per-round holds, it just
    // happens one call frame down where the scan can't see it.
    ("Network.scala", "labels")
  )

  private val planCalls = Seq(
    ".join(", ".groupBy(", ".select(", ".filter(", ".withColumn(",
    ".agg(", ".union", ".distinct", ".crossJoin(")

  /** Indentation of a line (spaces before the first non-space char). */
  private def indent(l: String): Int = l.takeWhile(_ == ' ').length

  /** Violations in one file's lines: (line number, var name, reason). */
  private[operators] def scan(fileName: String, lines: Seq[String]): Seq[(Int, String, String)] = {
    // comment-stripped code lines (scaladoc bodies legitimately name
    // the banned shapes when documenting the rule)
    val code = lines.map { raw =>
      val t = raw.trim
      if (t.startsWith("*") || t.startsWith("/*")) "" else raw.split("//", 2).head
    }
    val decl = raw"""\bvar\s+(\w+)\s*(?::\s*[\w\[\]. ]+)?=""".r
    val declared = code.zipWithIndex.flatMap { case (l, i) =>
      decl.findAllMatchIn(l).map(m => m.group(1) -> i)
    }.toMap
    // the statement chunk starting at line i: the line plus successive
    // continuation lines — repo style opens continuations with '.',
    // and a line ENDING at '=' (RHS pushed down by a formatter)
    // continues on the next line unconditionally
    def chunk(i: Int): String = {
      val b = new StringBuilder(code(i))
      var j = i + 1
      while (j < code.length &&
          (code(j).trim.startsWith(".") || code(j - 1).trim.endsWith("="))) {
        b.append(' ').append(code(j)); j += 1
      }
      b.toString
    }
    // "frame" = the declaration + reassignment chunks together use ≥2
    // DISTINCT plan-building calls: every real DataFrame loop in main
    // chains several (join/groupBy/agg/select/...), while a Scala
    // collection var that happens to use ONE shared-name method
    // (e.g. `state.getOption.getOrElse(Nil).filter(...)` in a
    // flatMapGroupsWithState fold) must not be flagged
    def isFrame(name: String, i: Int): Boolean = {
      val text = chunk(i) + declared.get(name).map(d => " " + chunk(d)).getOrElse("")
      planCalls.count(text.contains) >= 2
    }
    def isLoopHeader(l: String): Boolean =
      l.contains("while (") || l.contains("for (") || l.contains("for {") ||
        l.contains(".foreach")
    // walk OUTWARD through enclosing blocks (if/match/try nesting must
    // not hide a loop — the single-step version was blind to
    // `while { if (..) { frame = ... } }`), stopping at a def/val
    // boundary: a reassignment not under any loop header isn't
    // loop-carried
    def enclosingLoop(i: Int): Option[String] = {
      var cur = indent(code(i))
      var j = i - 1
      while (j >= 0 && cur > 0) {
        val l = code(j)
        if (l.trim.nonEmpty && indent(l) < cur) {
          if (isLoopHeader(l)) return Some(l.trim)
          if (l.contains("def ") || l.contains("object ") || l.contains("class ")) return None
          cur = indent(l)
        }
        j -= 1
      }
      None
    }
    val reassign = raw"""^(\s*)(\w+)\s*=(?!=)""".r
    val fixedSmall = raw""".*for \(\w+ <- 1 to ([1-6])\).*""".r
    code.zipWithIndex.flatMap { case (l, i) =>
      reassign.findFirstMatchIn(l).toSeq.collect {
        case m if declared.get(m.group(2)).exists(_ < i) && isFrame(m.group(2), i) =>
          (m.group(2), enclosingLoop(i), i)
      }
    }.collect {
      case (name, Some(loop), i)
          if !chunk(i).contains("localCheckpoint")
            && (fixedSmall.unapplySeq(loop): Option[List[String]]).isEmpty
            && !exemptions((fileName, name)) =>
        (i + 1, name,
          s"loop-carried frame reassignment under `$loop` with no " +
            "localCheckpoint in the statement and no fixed small round count")
    }
  }

  test("scanner catches a seeded violation (negative self-test)") {
    val seeded = Seq(
      "def bad(s: SparkSession): DataFrame = {",
      "  var frame = edges.select(col(\"src\").as(\"id\")).distinct()",
      "  while (changed > 0) {",
      "    frame = frame.join(next, Seq(\"id\"))",
      "      .groupBy(\"id\").agg(min(col(\"d\")).as(\"d\"))",
      "  }",
      "  frame",
      "}")
    val hits = scan("Seeded.scala", seeded)
    assert(hits.map(_._2) == Seq("frame"), s"scanner went blind: $hits")
    // and the two legal forms pass: checkpoint in the statement…
    val ok1 = seeded.updated(4, "      .groupBy(\"id\").agg(min(col(\"d\")).as(\"d\")).localCheckpoint()")
    assert(scan("Seeded.scala", ok1).isEmpty)
    // …and a fixed small round count
    val ok2 = seeded.updated(2, "  for (r <- 1 to 3) {")
    assert(scan("Seeded.scala", ok2).isEmpty)
    // but a LARGE fixed count is not "small": lineage still stacks
    val big = seeded.updated(2, "  for (r <- 1 to 40) {")
    assert(scan("Seeded.scala", big).map(_._2) == Seq("frame"))
    // nesting must not hide the loop: reassignment inside an if-block
    // within the while is still loop-carried
    val nested = Seq(
      "def bad(s: SparkSession): DataFrame = {",
      "  var frame = edges.select(col(\"src\").as(\"id\")).distinct()",
      "  while (changed > 0) {",
      "    if (round % 2 == 0) {",
      "      frame = frame.join(next, Seq(\"id\"))",
      "        .groupBy(\"id\").agg(min(col(\"d\")).as(\"d\"))",
      "    }",
      "  }",
      "  frame",
      "}")
    assert(scan("Seeded.scala", nested).map(_._2) == Seq("frame"),
      "if-nesting hid the loop from the scanner")
    // an RHS pushed to the next line by a formatter is still a
    // reassignment statement
    val pushed = Seq(
      "def bad(s: SparkSession): DataFrame = {",
      "  var frame = edges.select(col(\"src\").as(\"id\")).distinct()",
      "  while (changed > 0) {",
      "    frame =",
      "      frame.join(next, Seq(\"id\")).groupBy(\"id\").agg(min(col(\"d\")).as(\"d\"))",
      "  }",
      "  frame",
      "}")
    assert(scan("Seeded.scala", pushed).map(_._2) == Seq("frame"),
      "next-line RHS evaded the reassignment regex")
    // and a reassignment NOT under any loop (straight-line rebind) is
    // not loop-carried — the def boundary stops the outward walk
    val straight = seeded.patch(2, Seq("  if (cond) {"), 1)
    assert(scan("Seeded.scala", straight).isEmpty,
      "non-loop rebind under an if was misflagged")
  }

  test("every loop-carried DataFrame var in main checkpoints, is bounded, or is exempted") {
    def files(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) files(f) else if (f.getName.endsWith(".scala")) Seq(f) else Nil
      }
    val all = files(new java.io.File("src/main/scala/graft")).sortBy(_.getName)
    assert(all.nonEmpty, "no main sources found — path convention changed?")
    val hits = all.flatMap { f =>
      import scala.jdk.CollectionConverters._
      scan(f.getName, java.nio.file.Files.readAllLines(f.toPath).asScala.toSeq)
        .map { case (n, v, why) => s"  ${f.getName}:$n [$v] $why" }
    }
    assert(hits.isEmpty,
      "iterative-loop convention violations (checkpoint per round, bound the " +
        "rounds, or write an exemption here):\n" + hits.mkString("\n"))
    // exemption hygiene: every exemption must still match a real file
    val names = all.map(_.getName).toSet
    val stale = exemptions.filterNot { case (f, _) => names(f) }
    assert(stale.isEmpty, s"stale exemptions for deleted files: $stale")
  }
}

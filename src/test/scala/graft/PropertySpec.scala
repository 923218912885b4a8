package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (SURVEY §5.2's scalacheck tier) for the pure
  * kernels — no SparkSession needed, hundreds of seeded random cases
  * each (raw scalacheck Gen; the scalatest bridge isn't in the offline
  * dependency cache).
  */
class PropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def cases[T](gen: Gen[T], n: Int = 200)(body: T => Unit): Unit =
    (0 until n).foreach { i => body(gen.pureApply(params, Seed(i.toLong))) }

  // --- RollingHashMin's arithmetic vs a per-window recompute oracle
  private val B = 257L
  private val P = 1000003L

  private def naiveMin(bytes: Array[Byte], k0: Int): Long = {
    val k = math.max(1, math.min(k0, bytes.length))
    if (bytes.isEmpty) 0L
    else
      (0 to bytes.length - k).map { w =>
        bytes.slice(w, w + k).foldLeft(0L)((h, c) => (h * B + (c & 0xff)) % P)
      }.min
  }

  private def rollingMin(bytes: Array[Byte], k0: Int): Long = {
    // mirrors RollingHashMin.nullSafeEval exactly
    val k = math.max(1, math.min(k0, bytes.length))
    if (bytes.isEmpty) return 0L
    var bk = 1L; var t = 0
    while (t < k - 1) { bk = bk * B % P; t += 1 }
    var h = 0L; var minH = Long.MaxValue; var i = 0
    while (i < bytes.length) {
      h = (h * B + (bytes(i) & 0xff)) % P
      if (i >= k)
        h = (h - (bytes(i - k) & 0xff) * bk % P * B % P + P * B) % P
      if (i >= k - 1 && h < minH) minH = h
      i += 1
    }
    if (minH == Long.MaxValue) h else minH
  }

  test("rolling O(1) window update equals per-window recompute for all strings and k") {
    val gen = Gen.zip(
      Gen.containerOf[Array, Byte](Gen.choose[Byte](Byte.MinValue, Byte.MaxValue)),
      Gen.choose(1, 40))
    cases(gen, 500) { case (bytes, k) =>
      assert(rollingMin(bytes, k) == naiveMin(bytes, k), s"k=$k len=${bytes.length}")
    }
  }

  // --- DefParser round-trip: registered samples with files survive
  test("DefParser keeps exactly the registered samples that have files") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map("S" + _.mkString.take(8))
    val gen = Gen.zip(Gen.listOfN(8, nameGen), Gen.listOfN(8, Gen.oneOf(true, false)))
    cases(gen) { case (names0, hasFile0) =>
      val names = names0.distinct
      val hasFile = hasFile0.take(names.size)
      val lines = Seq("def\tsample-type\tt") ++
        names.map(n => s"def\tsample\t$n") ++
        names.zip(hasFile).collect { case (n, true) => s"t\t$n\tfiles/$n.txt" }
      val c = pipeline.DefParser.parse(lines)
      val expected = names.zip(hasFile).collect { case (n, true) => n }.sorted
      assert(c.samples.map(_.name) == expected)
    }
  }

  // --- union-find vs min-label: component structure invariants
  test("connected-component labeling invariant: endpoints of every edge share a label") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 20)))
    cases(edgeGen) { edges0 =>
      val edges = edges0.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val parent = Array.tabulate(21)(identity)
        def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        edges.foreach { case (a, b) => assert(find(a) == find(b)) }
      }
    }
  }
}

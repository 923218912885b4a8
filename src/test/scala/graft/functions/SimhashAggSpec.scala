package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The SimHash aggregators' correctness rests on partial aggregation:
  * Spark may split the input across any partitioning, reduce each
  * slice, and merge buffers in any grouping — the result must equal
  * the single-pass fold (and the naive per-bit balance definition).
  * The oracle gate proves end-to-end values; this pins the algebraic
  * property the map-side combine depends on.
  */
class SimhashAggSpec extends AnyFunSuite {

  private def naive32(hs: Seq[Long]): Long = {
    var sig = 0L
    for (j <- 0 until 32) {
      val bal = hs.map(h => 2 * ((h >> j) & 1L) - 1L).sum
      if (bal > 0) sig |= 1L << j
    }
    sig
  }

  private def naive64(hs: Seq[(Long, Long)]): Long = {
    var sig = 0L
    for (j <- 0 until 64) {
      val bal = hs.map { case (ha, hb) =>
        2 * ((if (j < 60) ha >> j else hb >> (j - 60)) & 1L) - 1L
      }.sum
      if (bal > 0) sig |= 1L << j
    }
    sig
  }

  /** Split xs into random slices, reduce each from zero, merge the
    * buffers pairwise in shuffled order.
    */
  private def foldSplit[I](
      agg: org.apache.spark.sql.expressions.Aggregator[I, SimhashAggs.BitBuf, java.lang.Long],
      xs: Seq[I],
      rnd: Random,
  ): Long = {
    val slices = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[I]]
      var rest = xs
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(math.max(1, rest.length))
        out += rest.take(k)
        rest = rest.drop(k)
      }
      // empty slices happen in real partitionings too
      out += Seq.empty[I]
      rnd.shuffle(out.toSeq)
    }
    val bufs = slices.map(s => s.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.reduce(agg.merge)).longValue()
  }

  test("simhash32: split/merge fold == single fold == naive per-bit balance") {
    val rnd = new Random(23)
    for (_ <- 1 to 200) {
      val hs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() & 0xffffffffL)
      val expected = naive32(hs)
      val single = SimhashAggs.Simhash32Agg.finish(
        hs.map(java.lang.Long.valueOf).foldLeft(SimhashAggs.Simhash32Agg.zero)(
          SimhashAggs.Simhash32Agg.reduce)).longValue()
      val split = foldSplit[java.lang.Long](
        SimhashAggs.Simhash32Agg, hs.map(java.lang.Long.valueOf), rnd)
      assert(single == expected && split == expected, s"hs=$hs")
    }
  }

  test("simhash64: split/merge fold == single fold == naive per-bit balance") {
    val rnd = new Random(29)
    for (_ <- 1 to 200) {
      val hs = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextLong() & ((1L << 60) - 1), rnd.nextLong() & 0xfL))
      val expected = naive64(hs)
      val in = hs.map { case (a, b) =>
        (java.lang.Long.valueOf(a), java.lang.Long.valueOf(b))
      }
      val single = SimhashAggs.Simhash64Agg.finish(
        in.foldLeft(SimhashAggs.Simhash64Agg.zero)(SimhashAggs.Simhash64Agg.reduce))
        .longValue()
      val split = foldSplit[(java.lang.Long, java.lang.Long)](
        SimhashAggs.Simhash64Agg, in, rnd)
      assert(single == expected && split == expected, s"hs=$hs")
    }
  }

  test("bit 63 lands on Long.MinValue and each null column skips only its own bits") {
    val a = SimhashAggs.Simhash64Agg
    // single hash with ONLY bit 63 set (hb bit 3) → balance +1 on j=63,
    // -1 elsewhere → signature = 1L << 63 = Long.MinValue
    val buf = a.reduce(a.zero, (java.lang.Long.valueOf(0L), java.lang.Long.valueOf(8L)))
    assert(a.finish(buf).longValue() == java.lang.Long.MIN_VALUE)
    // a fully-null row moves nothing
    val b2 = a.reduce(buf, (null, null))
    assert(a.finish(b2).longValue() == java.lang.Long.MIN_VALUE)
    // null ha leaves bits 0-59 untouched but hb still votes on 60-63
    // (mirrors the oracle's per-bit SUM, which skips only the bits
    // sourced from the null column): hb=8 re-ups bit 63 to balance +2,
    // and bits 60-62 sink further negative — signature unchanged
    val b3 = a.reduce(b2, (null, java.lang.Long.valueOf(8L)))
    assert(a.finish(b3).longValue() == java.lang.Long.MIN_VALUE)
    // null hb leaves bits 60-63 untouched: ha=1 with null hb flips bit 0
    // positive without eroding the bit-63 balance
    val b4 = a.reduce(a.zero, (java.lang.Long.valueOf(1L), null))
    assert(a.finish(b4).longValue() == 1L)
  }
}

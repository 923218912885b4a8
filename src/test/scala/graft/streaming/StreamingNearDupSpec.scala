package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

// top-level for encoder codegen (see StreamsSpec note)
case class SigEv(doc_id: Long, simhash: Long, ts: Timestamp)

/** Streaming near-dup dedup (VERDICT r7 #7): nearDupPairsStream must
  * reproduce batch q29 exactly on a replayed fixture, and its banded
  * keyed state must evict at the watermark.
  */
class StreamingNearDupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("replayed fixture signatures reproduce batch q29 pairs exactly") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    // upstream stateless stage: the q28 signatures (the q29 machinery's
    // own input), replayed in doc_id order inside one watermark window
    val sigs = graft.SparkEntry.queries("q28_simhash")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(sigs.length > 100, s"fixture too small: ${sigs.length}")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = sigs.map { case (id, sh) => SigEv(id, sh, new Timestamp(base + id * 1000)) }

    val input = MemoryStream[SigEv]
    val q = Streams.nearDupPairsStream(input.toDF(), watermarkMs = 24L * 3600 * 1000)
      .writeStream.format("memory").queryName("neardup_eq")
      .outputMode("append").start()
    try {
      // several micro-batches: pairs must match across batch boundaries
      events.grouped(events.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val got = s.table("neardup_eq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = graft.SparkEntry.queries("q29_simhash_pairs")(s, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(want.nonEmpty, "batch q29 found no pairs — vacuous equivalence")
      assert(got == want,
        s"stream≠batch: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("state evicts at the watermark: an aged-out document stops matching") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[SigEv]
    val q = Streams.nearDupPairsStream(input.toDF(), watermarkMs = 60000L)
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    try {
      val sigA = 0L
      val far = 0xf0f0f0f0L // hamming 16 from sigA — never pairs
      input.addData(SigEv(1, sigA, Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // advance the watermark to 10:09 — doc 1 ages out of every bucket
      input.addData(SigEv(99, far, Timestamp.valueOf("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // identical signature, but the only match was evicted → no pair
      input.addData(SigEv(2, sigA, Timestamp.valueOf("2024-01-01 10:10:01")))
      q.processAllAvailable()
      // in-window duplicate still pairs: (2, 3) at hamming 0
      input.addData(SigEv(3, sigA, Timestamp.valueOf("2024-01-01 10:10:02")))
      q.processAllAvailable()
      val pairs = s.table("neardup_evict")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(!pairs.exists(p => p._1 == 1L), s"evicted doc 1 still matched: $pairs")
      assert(pairs.contains((2L, 3L, 0L)), s"in-window pair missing: $pairs")
    } finally q.stop()
  }
}

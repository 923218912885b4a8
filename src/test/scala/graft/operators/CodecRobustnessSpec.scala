package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial inputs for the binary codec paths (round-12 review):
  * every case here was RED against the previous formulation — a
  * crafted chunk size hung the task forever, an overflowing frame
  * length erased already-decoded frames, and a NULL payload aborted
  * the whole job instead of dropping its row. The file's contract is
  * "a corrupt blob drops its ROW (or its bad part), never the task".
  */
class CodecRobustnessSpec extends SparkSpec {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  test("wavSamples: a negative RIFF chunk size returns None instead of spinning forever") {
    // 'RIFF' + size + 'WAVE' + one chunk whose LE32 size is -8: the old
    // walk's increment was 8 + (-8) + 0 = 0 — an infinite loop no
    // catch can break (this test HANGS on the old code; red-first)
    val payload =
      "RIFF".getBytes("US-ASCII") ++ le32(100) ++ "WAVE".getBytes("US-ASCII") ++
        "junk".getBytes("US-ASCII") ++ le32(-8) ++ Array.fill[Byte](16)(0)
    assert(MultimodalOps.wavSamples(payload).isEmpty)
    // -9 exercises the odd-size word-align branch (8 - 9 + 1 = 0)
    val payload2 =
      "RIFF".getBytes("US-ASCII") ++ le32(100) ++ "WAVE".getBytes("US-ASCII") ++
        "junk".getBytes("US-ASCII") ++ le32(-9) ++ Array.fill[Byte](16)(0)
    assert(MultimodalOps.wavSamples(payload2).isEmpty)
    // a well-formed container still decodes
    assert(MultimodalOps.wavSamples(MultimodalOps.syntheticWav(7L)).isDefined)
  }

  test("sampleVideoFrames: an overflowing frame-length prefix keeps the good frames before it") {
    // frame 0 = valid PNG (decodes), frame 1's length = Int.MaxValue:
    // the old bounds check `off + len > payload.length` wrapped
    // negative and the subsequent walk threw into a catch that
    // discarded frame 0's row
    val png = MultimodalOps.syntheticVideo(3L) // well-formed, >=4 frames
    val goodAll = MultimodalOps.sampleVideoFrames(3L, png, 1).toSeq
    assert(goodAll.nonEmpty, "fixture container must decode")
    val frame0 = {
      // rebuild a 2-frame container: valid frame 0 + bogus frame 1
      val inner = MultimodalOps.sampleVideoFrames(3L, png, 1).toSeq.head
      inner // just to assert the fixture shape is sane
    }
    assert(frame0.fidx == 0L)
    // craft: GVID, n=3, [len0][png0][len=MaxValue] — n MUST exceed the
    // frames present so the walk continues PAST the bogus frame: the
    // old overflow let `off += Int.MaxValue` go negative, the next
    // header read threw, and the catch returned Iterator.empty —
    // discarding frame 0 (with n=2 the loop exits on f<n first and the
    // old code passes by luck)
    val png0 = {
      // extract frame 0's bytes from the synthetic container
      val n0 = java.nio.ByteBuffer.wrap(png.slice(8, 12).reverse).getInt
      png.slice(12, 12 + n0)
    }
    val crafted =
      "GVID".getBytes("US-ASCII") ++ le32(3) ++
        le32(png0.length) ++ png0 ++ le32(Int.MaxValue)
    val out = MultimodalOps.sampleVideoFrames(99L, crafted, 1).toSeq
    assert(out.map(_.fidx) == Seq(0L),
      s"good frame 0 must survive the bad frame 1: got ${out.map(_.fidx)}")
  }

  test("NULL payloads drop their row in decodeMedia/chunkMedia/sampleFrames, never the task") {
    val s = spark; import s.implicits._
    val media = Seq(
      (1L, Some(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))),
      (2L, Option.empty[Array[Byte]]), // the row that aborted the job
      (3L, Some(Array[Byte](9, 10, 11, 12)))).toDF("doc_id", "payload")
    val decoded = MultimodalOps.decodeMedia(s, media)
    assert(decoded.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val chunked = MultimodalOps.chunkMedia(s, media, 4)
    assert(chunked.filter(col("doc_id") === 2L).count() == 0 && chunked.count() == 3)
    val framed = MultimodalOps.sampleFrames(s, media, 4, 1)
    assert(framed.filter(col("doc_id") === 2L).count() == 0 && framed.count() == 3)
  }
}

package graft.operators

import graft.SparkSpec

/** The real WAV parser: exact features on synthesized clips, and every
  * malformed-payload class drops the row (None), never throws.
  */
class WavDecodeSpec extends SparkSpec {

  test("synthetic WAV round-trips: header facts and closed-form features") {
    for (id <- Seq(0L, 1L, 7L, 63L, 99L, 123L)) {
      val d = MultimodalOps.decodeWav(id, MultimodalOps.syntheticWav(id))
        .getOrElse(fail(s"clip $id did not decode"))
      val n = 64 + id % 64
      val amp = 1000 + (id % 100) * 10
      val half = 2 + id % 4
      assert(d.sample_rate == 8000L)
      assert(d.n_samples == n)
      assert(d.peak == amp)
      assert(d.rms == amp.toDouble) // ±amp square wave ⇒ RMS exactly amp
      assert(d.zero_crossings == (n - 1) / half)
    }
  }

  test("malformed payloads return None, never throw") {
    val good = MultimodalOps.syntheticWav(5L)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "null" -> null,
      "empty" -> Array.emptyByteArray,
      "short" -> good.take(8),
      "bad magic" -> ("JUNK".getBytes ++ good.drop(4)),
      "truncated data" -> good.take(good.length - 10),
      "not audio" -> Array.fill[Byte](256)(0x41))
    for ((label, bytes) <- cases)
      assert(MultimodalOps.decodeWav(1L, bytes).isEmpty, s"case '$label' should drop")
  }

  test("audio framing: per-frame stats match a direct recount, partial tail kept") {
    for (id <- Seq(0L, 3L, 42L, 127L)) {
      val n = (64 + id % 64).toInt
      val samples = Array.tabulate(n)(i => ((id + 3L * i) % 2001L - 1000L).toInt)
      val frames = MultimodalOps
        .audioFrames(id, MultimodalOps.syntheticWavRamp(id), 16).toSeq
      assert(frames.length == (n + 15) / 16)
      for (f <- frames) {
        val w = samples.slice(f.fidx.toInt * 16, f.fidx.toInt * 16 + 16)
        assert(f.n_samples == w.length)
        assert(f.peak == w.map(v => math.abs(v.toLong)).max)
        assert(math.abs(f.rms -
          math.sqrt(w.map(v => v.toDouble * v).sum / w.length)) < 1e-9)
      }
      assert(frames.last.n_samples == (if (n % 16 == 0) 16 else n % 16))
    }
    assert(MultimodalOps.audioFrames(1L, Array.fill[Byte](64)(0x42), 16).isEmpty)
  }

  test("stereo / non-16-bit fmt is rejected (decoder only claims PCM16 mono)") {
    val good = MultimodalOps.syntheticWav(9L)
    val stereo = good.clone(); stereo(22) = 2 // channels field
    assert(MultimodalOps.decodeWav(9L, stereo).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8 // bits-per-sample field
    assert(MultimodalOps.decodeWav(9L, eightBit).isEmpty)
  }
}

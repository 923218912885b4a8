package graft.operators

import graft.SparkSpec

/** The video container walker: seek-past-skipped-frames sampling,
  * closed-form frame features, and partial salvage of malformed
  * containers (good prefix kept, bad tail dropped, never a throw).
  */
class VideoContainerSpec extends SparkSpec {

  test("sampled frames carry the construction's luma histogram") {
    for (id <- Seq(0L, 3L, 11L, 42L)) {
      val n = (4 + id % 5).toInt
      val frames = MultimodalOps.sampleVideoFrames(id, MultimodalOps.syntheticVideo(id), 2).toSeq
      assert(frames.map(_.fidx) == (0 until n by 2).map(_.toLong))
      for (f <- frames) {
        assert(f.n_frames == n && f.width == 8 && f.height == 8)
        val bins = (0 until 8).map(y => (((id + f.fidx + 17 * y) % 256) / 64).toInt)
        val expected = (0 to 3).map(b => 8L * bins.count(_ == b))
        assert(Seq(f.vbin0, f.vbin1, f.vbin2, f.vbin3) == expected)
      }
    }
  }

  test("stride 1 decodes every frame; stride larger than n keeps frame 0 only") {
    val id = 7L
    val n = (4 + id % 5).toInt
    val all = MultimodalOps.sampleVideoFrames(id, MultimodalOps.syntheticVideo(id), 1).toSeq
    assert(all.map(_.fidx) == (0 until n).map(_.toLong))
    val first = MultimodalOps.sampleVideoFrames(id, MultimodalOps.syntheticVideo(id), 100).toSeq
    assert(first.map(_.fidx) == Seq(0L))
  }

  test("malformed containers salvage the good prefix and never throw") {
    val good = MultimodalOps.syntheticVideo(5L)
    assert(MultimodalOps.sampleVideoFrames(5L, null, 2).isEmpty)
    assert(MultimodalOps.sampleVideoFrames(5L, Array.emptyByteArray, 2).isEmpty)
    assert(MultimodalOps.sampleVideoFrames(
      5L, "XVID".getBytes ++ good.drop(4), 2).isEmpty)
    // truncated mid-frame: frames before the cut still decode
    val cut = MultimodalOps.sampleVideoFrames(5L, good.take(good.length - 20), 1).toSeq
    val full = MultimodalOps.sampleVideoFrames(5L, good, 1).toSeq
    assert(cut.nonEmpty && cut.size < full.size && cut == full.take(cut.size))
    // one corrupt frame body among good ones: its row drops, the walk
    // continues on the intact length prefixes
    val withBadFrame = good.clone()
    val firstLen = (good(8) & 0xff) | ((good(9) & 0xff) << 8) |
      ((good(10) & 0xff) << 16) | ((good(11) & 0xff) << 24)
    for (i <- 12 + 8 until 12 + firstLen) withBadFrame(i) = 0x00
    val salvaged = MultimodalOps.sampleVideoFrames(5L, withBadFrame, 1).toSeq
    assert(salvaged.map(_.fidx) == full.map(_.fidx).drop(1))
  }
}

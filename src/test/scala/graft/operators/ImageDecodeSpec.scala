package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** The REAL image decode path: PNG fixtures generated in-test, decoded
  * through the same mapPartitions plumbing as the stub, golden-checked
  * on dimensions, channel count, and luminance histogram.
  */
class ImageDecodeSpec extends SparkSpec {

  /** w×h RGB PNG where each pixel's gray level is given by `gray(x, y)`. */
  private def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImageMedia: real PNG decode with golden dimensions and histogram") {
    val s = spark; import s.implicits._
    // 8×4 image: top half black (bin 0), bottom half white (bin 3)
    val halfHalf = png(8, 4, (_, y) => if (y < 2) 0 else 255)
    // 5×3: all mid-gray 100 → luma 100 → bin 1
    val midGray = png(5, 3, (_, _) => 100)
    // corrupt payload: must be dropped, not crash
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)

    val media = Seq(
      (1L, halfHalf), (2L, midGray), (3L, garbage),
    ).toDF("doc_id", "payload")

    val rows = MultimodalOps.decodeImageMedia(s, media)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L), "corrupt payload must drop")

    val r1 = rows(0)
    assert(r1.getLong(2) == 8L && r1.getLong(3) == 4L, "dimensions")
    assert(r1.getLong(4) == 3L, "RGB channel count")
    assert(r1.getLong(1) == halfHalf.length.toLong, "payload byte size")
    val feat1 = r1.getSeq[Double](5)
    assert(feat1 == Seq(0.5, 0.0, 0.0, 0.5), s"half-black/half-white histogram: $feat1")

    val r2 = rows(1)
    assert(r2.getLong(2) == 5L && r2.getLong(3) == 3L)
    val feat2 = r2.getSeq[Double](5)
    assert(feat2 == Seq(0.0, 1.0, 0.0, 0.0), s"uniform mid-gray histogram: $feat2")
  }

  test("decodeImage kernel: PNG roundtrip preserves exact gray levels per bin") {
    // gradient image covering all 4 bins equally: gray = x * 64 over x<4
    val grad = png(4, 2, (x, _) => x * 64 + 1)
    val dec = MultimodalOps.decodeImage(7L, grad)
    assert(dec.isDefined)
    val d = dec.get
    assert(d.doc_id == 7L && d.width == 4L && d.height == 2L)
    // each column lands in its own luminance bin → uniform histogram
    assert(d.feat.toSeq == Seq(0.25, 0.25, 0.25, 0.25), d.feat.toSeq.toString)
    // undecodable → None
    assert(MultimodalOps.decodeImage(8L, Array[Byte](1, 2, 3)).isEmpty)
    assert(MultimodalOps.decodeImage(9L, Array.empty[Byte]).isEmpty)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Semantic property tests for the dedup signatures: the oracle gate
  * proves Spark==DuckDB; these prove the signatures actually DETECT
  * near-duplicates — a near-identical document pair must land within
  * small hamming distance / share MinHash bands, and unrelated docs
  * must not.
  */
class DedupSemanticsSpec extends SparkSpec {

  private def randWords(rnd: Random, n: Int): IndexedSeq[String] =
    (0 until n).map(_ => rnd.alphanumeric.filter(_.isLetter).take(3 + rnd.nextInt(5)).mkString.toLowerCase)

  test("simhash: near-dup pair close in hamming, unrelated docs far") {
    val s = spark; import s.implicits._
    val rnd = new Random(31)
    val base = randWords(rnd, 120)
    val nearDup = base.updated(10, "changed").updated(80, "word") // 2 of 120 words
    val unrelated = (0 until 8).map(i => randWords(rnd, 120))
    // drive the REAL q28 operator over a staged fixture dir — a private
    // SQL re-implementation here would keep passing if the operator
    // regressed
    val dir = java.nio.file.Files.createTempDirectory("graft_simhash_sem")
    (Seq(base, nearDup) ++ unrelated).zipWithIndex
      .map { case (ws, i) =>
        (i.toLong, ws.mkString(" "), "en", "synthetic", ws.mkString(" ").length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sig = graft.SparkEntry.queries("q28_simhash")(s, dir.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearH = hamming(sig(0L), sig(1L))
    assert(nearH <= 6, s"near-dup hamming $nearH")
    val unrelatedH = (2L until 10L).map(i => hamming(sig(0L), sig(i)))
    assert(unrelatedH.forall(_ > 6), s"unrelated hammings $unrelatedH")
  }

  test("minhash bands: near-dup shares a band, unrelated docs do not collide") {
    val s = spark
    val rnd = new Random(77)
    val base = randWords(rnd, 150)
    val nearDup = base.updated(5, "xx") // 1 of 150 words changed
    val unrelated = (0 until 6).map(_ => randWords(rnd, 150))
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash_sem")
    import s.implicits._
    val docs = (Seq(base, nearDup) ++ unrelated).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "en", "synthetic", ws.mkString(" ").length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = graft.SparkEntry.queries("q27_minhash_lsh")(s, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)),
      s"expected exactly the near-dup pair (0,1), got: $pairs")
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashMinSpec extends SparkSpec {

  private val B = 257L
  private val P = 1000003L

  /** Naive oracle: hash every k-window independently, take the min. */
  private def naive(s: String, k0: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    val k = math.max(1, math.min(k0, bytes.length))
    if (bytes.isEmpty) return 0L
    val hashes = (0 to bytes.length - k).map { w =>
      bytes.slice(w, w + k).foldLeft(0L)((h, c) => (h * B + (c & 0xff)) % P)
    }
    hashes.min
  }

  test("rolling_hash_min matches the naive per-window oracle") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    val rnd = new scala.util.Random(17)
    val strs = (0 until 100).map { i =>
      i -> rnd.alphanumeric.take(5 + rnd.nextInt(200)).mkString
    } :+ (100 -> "short") :+ (101 -> "exactly16charsXX")
    val got = strs.toDF("id", "t")
      .select(col("id"), expr("rolling_hash_min(t, 16)").as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    strs.foreach { case (i, t) =>
      assert(got(i) == naive(t, 16), s"id $i: '${t.take(30)}'")
    }
  }

  test("interpreted eval matches codegen") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = RollingHashMin(
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox jumps")),
      Literal(16))
    val interpreted = e.eval(null).asInstanceOf[Long]
    val viaPlan = Seq(("the quick brown fox jumps")).toDF("t")
      .select(expr("rolling_hash_min(t, 16)")).head().getLong(0)
    assert(interpreted == viaPlan)
    assert(interpreted == naive("the quick brown fox jumps", 16))
  }

  test("non-positive or null k is rejected at analysis time") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    val df = Seq("abc").toDF("t")
    for (bad <- Seq("0", "-3", "CAST(NULL AS INT)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(expr(s"rolling_hash_min(t, $bad)")).collect()
      }
      assert(e.getMessage.contains("positive"), s"k=$bad: ${e.getMessage.take(120)}")
    }
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Converts two latent fixture assumptions into asserted facts, so a
  * future fixture drift fails HERE instead of flaking the oracle gate:
  *
  *  - q103/q117 flag outliers with a hard float cut (|z| > 3,
  *    |x − med| > 3.5·1.4826·mad). Spark and DuckDB are not guaranteed
  *    bit-identical on mean/stddev/interpolated-median (summation and
  *    interpolation order), but the cross-engine noise is ~1e-12; if
  *    every decision statistic sits ≥ 1e-6 from its cut, membership
  *    provably cannot flip. The margins were previously only measured
  *    and quoted in comments — here they are asserted at all three
  *    fixture scales.
  *
  *  - q33b/q33c slice BYTES of the binary payload in Spark but
  *    CHARACTERS via substr(text, …) in the DuckDB oracle (DuckDB
  *    1.0.0 has no blob substring). Byte and character slicing agree
  *    iff the fixture text is pure ASCII — asserted below via
  *    octet_length == character length on every document.
  */
class BoundaryMarginSpec extends SparkSpec {

  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("q103 z-score cut: every |z| sits >= 1e-6 from 3.0 at all scales") {
    dirs.foreach { dir =>
      val ev = Tables.events(spark, dir)
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("m"), stddev_samp(col("value")).as("sd"))
      val margin = ev.join(broadcast(stats), "event_type")
        .select(abs(abs((col("value") - col("m")) / col("sd")) - lit(3.0d)).as("d"))
        .agg(min("d")).head.getDouble(0)
      assert(margin >= 1e-6, s"$dir: a |z| lies within 1e-6 of the 3.0 cut (min margin $margin)")
    }
  }

  test("q117 MAD cut: every |x - med| sits >= 1e-6 from 3.5*1.4826*mad at all scales") {
    dirs.foreach { dir =>
      val ev = Tables.events(spark, dir)
      val med = ev.groupBy("event_type").agg(expr("percentile(value, 0.5D)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
      val margin = ev.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .select(abs(abs(col("value") - col("med")) - expr("3.5D * 1.4826D * mad")).as("d"))
        .agg(min("d")).head.getDouble(0)
      assert(margin >= 1e-6, s"$dir: a deviation lies within 1e-6 of the MAD cut (min margin $margin)")
    }
  }

  test("q33b/q33c byte==char slicing: documents.text is pure ASCII at all scales") {
    dirs.foreach { dir =>
      val nonAscii = Tables(spark, dir, "documents")
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(nonAscii == 0L, s"$dir: $nonAscii documents contain multi-byte characters; " +
        "q33b/q33c's byte-sliced Spark vs char-sliced DuckDB oracle would diverge")
    }
  }
}

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

  test("q159/q160 radius cuts: every pair distance sits >= 1e-6 km from 300/1000 at all scales") {
    // same class as the q103/q117 cuts (r15 operators review): Spark's
    // JVM Math.sin/asin vs DuckDB's libm differ in the last ulp, so a
    // pair within FP noise of exactly 300.0/1000.0 km would be included
    // by one engine and excluded by the other. Asserted over the FULL
    // cross product (the blocked join only sees candidate cells; a
    // boundary pair outside the blocks would still hit the oracle's
    // unblocked WHERE).
    dirs.foreach { dir =>
      val cust = GeoOps.customerPoints(spark, dir)
        .select(col("lat").as("clat"), col("lon").as("clon"))
      val sup = GeoOps.supplierPoints(spark, dir)
        .select(col("lat").as("slat"), col("lon").as("slon"))
      val d = cust.crossJoin(sup).select(
        GeoOps.haversineKm(col("clat"), col("clon"), col("slat"), col("slon")).as("d"))
      val m = d.agg(
        min(abs(col("d") - lit(300.0d))).as("m300"),
        min(abs(col("d") - lit(1000.0d))).as("m1000")).head
      assert(m.getDouble(0) >= 1e-6,
        s"$dir: a pair distance lies within 1e-6 km of the 300 km cut (min margin ${m.getDouble(0)})")
      assert(m.getDouble(1) >= 1e-6,
        s"$dir: a pair distance lies within 1e-6 km of the 1000 km cut (min margin ${m.getDouble(1)})")
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

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent witness for the geo grid blocking: the blocked distance
  * join (q159) and blocked kNN (q160) must equal a brute-force
  * all-pairs computation on the same derived points — i.e. the 3×3
  * neighbourhood at the chosen cell sizes drops no in-radius pair,
  * including across the antimeridian wrap.
  */
class GeoBlockingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** All-pairs haversine pairs under rKm, no blocking — the witness. */
  private def brutePairs(rKm: Double) = {
    val cust = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        (col("c_nationkey") * 37 % 140 - lit(70.0)) +
          (col("c_custkey") * 7919 % 600) / 100.0 - 3.0 as "clat",
        (col("c_nationkey") * 89 % 360 - lit(180.0)) +
          (col("c_custkey") * 104729 % 600) / 100.0 - 3.0 as "clon")
    val supp = graft.Tables(spark, dir, "supplier")
      .select(col("s_suppkey"),
        (col("s_nationkey") * 37 % 140 - lit(70.0)) +
          (col("s_suppkey") * 7919 % 600) / 100.0 - 3.0 as "slat",
        (col("s_nationkey") * 89 % 360 - lit(180.0)) +
          (col("s_suppkey") * 104729 % 600) / 100.0 - 3.0 as "slon")
    cust.crossJoin(supp)
      .withColumn("dist_km",
        lit(2.0 * 6371.0) * asin(sqrt(
          pow(sin(radians(col("slat") - col("clat")) / 2), 2) +
            cos(radians(col("clat"))) * cos(radians(col("slat"))) *
              pow(sin(radians(col("slon") - col("clon")) / 2), 2))))
      .filter(col("dist_km") < rKm)
  }

  test("non-divisor lonCellDeg is rejected loudly") {
    // r15 operators review: a lonCellDeg that does not divide 360 puts
    // the last partial cell's points at an index no replica can reach —
    // they silently lose EVERY in-radius pair, even coincident ones.
    // The guard must fire at plan-build time, before any data moves.
    val s = spark; import s.implicits._
    val pts = Seq((1L, 10.0, 179.5)).toDF("id", "lat", "lon")
    val ex = intercept[IllegalArgumentException] {
      GeoOps.blockedDistanceJoin(pts, pts, rKm = 100.0,
        latCellDeg = 10.0, lonCellDeg = 7.0)
    }
    assert(ex.getMessage.contains("divide 360"), ex.getMessage)
  }

  test("blocked 300 km distance join equals brute force all-pairs") {
    val blocked = GeoOps.specs.find(_.name == "q159_geo_distance_join").get
      .fn(spark, dir).select("c_custkey", "s_suppkey")
    val brute = brutePairs(300.0).select("c_custkey", "s_suppkey")
    assert(blocked.count() > 0)
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty)
  }

  test("fuzz: blocking is lossless on adversarial random points (antimeridian band, |lat| near 73)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42) // fixed seed — deterministic
    // half the points cluster in the danger zones: lon within 2° of
    // ±180 (wrap adjacency) and |lat| within 2° of 73 (widest lon
    // window the cell bound must still cover)
    def point(i: Int): (Long, Double, Double) = {
      val lat =
        if (i % 4 == 0) (71.0 + rnd.nextDouble() * 2.0) * (if (i % 8 == 0) 1 else -1)
        else rnd.nextDouble() * 146.0 - 73.0
      val lon =
        if (i % 2 == 0) 178.0 + rnd.nextDouble() * 4.0 // straddles ±180 pre-wrap
        else rnd.nextDouble() * 360.0 - 180.0
      val lonN = lon - 360.0 * math.floor((lon + 180.0) / 360.0)
      (i.toLong, lat, lonN)
    }
    val pts = (0 until 300).map(point)
    val l = pts.toDF("lid", "lat", "lon")
    val r = pts.map { case (id, la, lo) => (id + 1000L, la, lo) }.toDF("rid", "lat", "lon")
    for ((rKm, latC, lonC) <- Seq((300.0, 3.0, 10.0), (1000.0, 10.0, 36.0))) {
      val blocked = GeoOps.blockedDistanceJoin(l, r, rKm, latC, lonC)
        .select(col("lid"), col("slat"), col("slon"))
      val brute = l.toDF("lid", "clat", "clon")
        .crossJoin(r.toDF("rid", "slat", "slon"))
        .withColumn("d", lit(2.0 * 6371.0) * asin(sqrt(
          pow(sin(radians(col("slat") - col("clat")) / 2), 2) +
            cos(radians(col("clat"))) * cos(radians(col("slat"))) *
              pow(sin(radians(col("slon") - col("clon")) / 2), 2))))
        .filter(col("d") < rKm)
        .select(col("lid"), col("slat"), col("slon"))
      assert(brute.count() > 0, s"fuzz fixture generated no in-radius pairs at $rKm km")
      assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty,
        s"blocking lost or invented pairs at r=$rKm cells=${latC}x$lonC")
    }
  }

  test("blocked kNN equals brute-force top-3 within 1000 km") {
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy("c_custkey").orderBy(col("dist_km").asc, col("s_suppkey").asc)
    val bruteKnn = brutePairs(1000.0)
      .withColumn("rk", row_number().over(wB))
      .filter(col("rk") <= 3)
      .select("c_custkey", "rk", "s_suppkey")
    val blockedKnn = GeoOps.specs.find(_.name == "q160_geo_knn").get
      .fn(spark, dir).select("c_custkey", "rk", "s_suppkey")
    assert(blockedKnn.count() > 0)
    assert(blockedKnn.exceptAll(bruteKnn).isEmpty && bruteKnn.exceptAll(blockedKnn).isEmpty)
  }
}

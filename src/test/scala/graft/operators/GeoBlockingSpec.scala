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

  test("blocked 300 km distance join equals brute force all-pairs") {
    val blocked = GeoOps.specs.find(_.name == "q159_geo_distance_join").get
      .fn(spark, dir).select("c_custkey", "s_suppkey")
    val brute = brutePairs(300.0).select("c_custkey", "s_suppkey")
    assert(blocked.count() > 0)
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty)
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

package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial operators: grid-blocked haversine distance join and
  * per-row k-nearest-neighbours over (lat, lon) points.
  *
  * The fixtures carry no coordinates, so both engines derive them with
  * identical integer arithmetic: each nation gets a centroid from its
  * key, each customer/supplier jitters ±3° around its nation's
  * centroid. Derived latitude stays within ±73°, which is what makes
  * the grid blocking provably lossless (see below).
  *
  * Scale design — the all-pairs distance join is the classic 100 TB
  * killer (a cross join). The standard fix is spatial blocking: snap
  * every point to a (latCell, lonCell) grid cell sized so that any
  * pair within the radius differs by at most one cell per axis, emit
  * the probe side once per 3×3 neighbourhood (lon wrapping mod the
  * cell count), hash-join on the cell id, and only then evaluate the
  * exact haversine predicate. Pair generation is bounded by cell
  * co-location instead of |A|×|B|; the join is a plain equi-join that
  * shuffles (or broadcasts, when a side is dimension-sized — AQE
  * decides) on the cell key.
  *
  * Losslessness: haversine gives sin²(d/2R) = sin²(Δφ/2) +
  * cosφ₁cosφ₂·sin²(Δλ/2). From d < R_km: Δφ ≤ d/R_earth, and
  * sin(Δλ/2) ≤ sin(d/2R_earth)/√(cosφ₁cosφ₂). With |φ| ≤ 73°
  * (cos ≥ 0.292): d < 300 km ⟹ Δφ < 2.71° and Δλ < 9.26°, both under
  * the 3°/10° cells of q159; d < 1000 km ⟹ Δφ < 9.01° and Δλ < 31.3°,
  * under the 10°/36° cells of q160. GeoBlockingSpec asserts blocked ≡
  * brute-force on the fixture.
  */
object GeoOps {

  private val EarthRadiusKm = 6371.0

  /** Deterministic per-key point: nation-centroid + key-derived jitter.
    * Pure integer/double arithmetic so DuckDB reproduces it exactly.
    * Longitude is normalized into [-180, 180) — the raw centroid+jitter
    * can dip below -180, which would break the non-negative cell ids
    * and the mod-wrap adjacency. Haversine is 360°-periodic in Δλ, so
    * the normalized value is distance-identical to the oracle's raw one.
    */
  private def derivedPoint(df: DataFrame, key: String, nationKey: String): DataFrame =
    df.withColumn("lat",
        (col(nationKey) * 37 % 140 - lit(70.0)) + (col(key) * 7919 % 600) / 100.0 - 3.0)
      .withColumn("lon",
        (col(nationKey) * 89 % 360 - lit(180.0)) + (col(key) * 104729 % 600) / 100.0 - 3.0)
      .withColumn("lon", col("lon") - lit(360.0) * floor((col("lon") + 180.0) / 360.0))

  /** Exact great-circle distance in km between two (lat, lon) pairs. */
  private[operators] def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    lit(2.0 * EarthRadiusKm) * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)))

  /** Customer points with (latc, lonc) grid cell for the given cell sizes. */
  private def withCell(df: DataFrame, latCellDeg: Double, lonCellDeg: Double): DataFrame =
    df.withColumn("latc", floor((col("lat") + 90.0) / latCellDeg))
      .withColumn("lonc", floor((col("lon") + 180.0) / lonCellDeg))

  /** Probe side replicated to its 3×3 cell neighbourhood, lon wrapping. */
  private def withNeighborCells(
      df: DataFrame, latCellDeg: Double, lonCellDeg: Double): DataFrame = {
    val lonCells = math.round(360.0 / lonCellDeg)
    // the wrap modulus must TILE the circle (r15 operators review): a
    // lonCellDeg that does not divide 360 makes floor((lon+180)/cell)
    // reach cell index lonCells while every replica is wrapped into
    // [0, lonCells) — points in the last partial cell silently lose
    // ALL their in-radius pairs, even coincident ones
    require(math.abs(360.0 - lonCells * lonCellDeg) < 1e-9,
      s"lonCellDeg=$lonCellDeg does not divide 360 — the last partial " +
        "longitude cell would silently drop every pair it holds")
    withCell(df, latCellDeg, lonCellDeg)
      .withColumn("dl", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dn", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("latc", col("latc") + col("dl"))
      .withColumn("lonc", (col("lonc") + col("dn") + lonCells) % lonCells)
      .drop("dl", "dn")
  }

  private[operators] def customerPoints(s: SparkSession, dir: String): DataFrame =
    derivedPoint(Tables(s, dir, "customer"), "c_custkey", "c_nationkey")
      .select("c_custkey", "lat", "lon")

  private[operators] def supplierPoints(s: SparkSession, dir: String): DataFrame =
    derivedPoint(Tables(s, dir, "supplier"), "s_suppkey", "s_nationkey")
      .select("s_suppkey", "lat", "lon")

  /** Generic grid-blocked distance join — the reusable operator the
    * q159/q160 specs instantiate. Inputs carry `lat`/`lon` columns
    * (lon already normalized to [-180, 180)) plus any payload columns;
    * output is every cross-side pair within `rKm`, with `dist_km`,
    * left lat/lon as clat/clon and right as slat/slon. Cell sizes must
    * satisfy the radius-cover bound from the object doc — the caller
    * asserts the |lat| domain; GeoBlockingSpec fuzzes the guarantee on
    * random points including the antimeridian band and |lat| near 73°.
    */
  def blockedDistanceJoin(
      left: DataFrame, right: DataFrame,
      rKm: Double, latCellDeg: Double, lonCellDeg: Double): DataFrame = {
    val l = withCell(left, latCellDeg, lonCellDeg)
      .withColumnRenamed("lat", "clat").withColumnRenamed("lon", "clon")
    val r = withNeighborCells(right, latCellDeg, lonCellDeg)
      .withColumnRenamed("lat", "slat").withColumnRenamed("lon", "slon")
    l.join(r, Seq("latc", "lonc"))
      .withColumn("dist_km",
        haversineKm(col("clat"), col("clon"), col("slat"), col("slon")))
      .filter(col("dist_km") < rKm)
  }

  private def blockedPairs(
      s: SparkSession, dir: String,
      rKm: Double, latCellDeg: Double, lonCellDeg: Double): DataFrame =
    blockedDistanceJoin(
      customerPoints(s, dir), supplierPoints(s, dir), rKm, latCellDeg, lonCellDeg)

  /** Shared oracle CTE: the derived points, verbatim arithmetic. */
  private val oraclePoints =
    "WITH cust AS (SELECT c_custkey, " +
      "((c_nationkey*37) % 140) - 70.0 + ((c_custkey*7919) % 600)/100.0 - 3.0 AS clat, " +
      "((c_nationkey*89) % 360) - 180.0 + ((c_custkey*104729) % 600)/100.0 - 3.0 AS clon " +
      "FROM customer), " +
      "supp AS (SELECT s_suppkey, " +
      "((s_nationkey*37) % 140) - 70.0 + ((s_suppkey*7919) % 600)/100.0 - 3.0 AS slat, " +
      "((s_nationkey*89) % 360) - 180.0 + ((s_suppkey*104729) % 600)/100.0 - 3.0 AS slon " +
      "FROM supplier), " +
      "pairs AS (SELECT c_custkey, s_suppkey, " +
      "2*6371.0*asin(sqrt( sin(radians(slat-clat)/2)^2 " +
      "+ cos(radians(clat))*cos(radians(slat))*sin(radians(slon-clon)/2)^2 )) AS dist_km " +
      "FROM cust, supp) "

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      // Distance join: every (customer, supplier) pair within 300 km.
      // Spark side runs the lossless 3°×10° grid blocking (see object
      // doc); the oracle brute-forces all pairs — identical result,
      // sub-quadratic plan.
      "q159_geo_distance_join",
      (s, dir) =>
        blockedPairs(s, dir, rKm = 300.0, latCellDeg = 3.0, lonCellDeg = 10.0)
          .select(col("c_custkey"), col("s_suppkey"),
            round(col("dist_km"), 3).as("dist_km")),
      Some(oraclePoints +
        "SELECT c_custkey, s_suppkey, round(dist_km, 3) AS dist_km " +
        "FROM pairs WHERE dist_km < 300.0"),
    ),
    QuerySpec(
      // Geo kNN: each customer's 3 nearest suppliers within 1000 km
      // (fewer when fewer are in range). Candidates from the same
      // lossless blocking at 10°×36° cells; per-customer top-3 via a
      // rank window Spark bounds with WindowGroupLimit — no global
      // sort, no all-pairs.
      "q160_geo_knn",
      (s, dir) => {
        val w = Window.partitionBy("c_custkey")
          .orderBy(col("dist_km").asc, col("s_suppkey").asc)
        blockedPairs(s, dir, rKm = 1000.0, latCellDeg = 10.0, lonCellDeg = 36.0)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("c_custkey"), col("rk"), col("s_suppkey"),
            round(col("dist_km"), 3).as("dist_km"))
      },
      Some(oraclePoints +
        ", ranked AS (SELECT c_custkey, s_suppkey, dist_km, " +
        "row_number() OVER (PARTITION BY c_custkey " +
        "ORDER BY dist_km ASC, s_suppkey ASC) AS rk " +
        "FROM pairs WHERE dist_km < 1000.0) " +
        "SELECT c_custkey, rk, s_suppkey, round(dist_km, 3) AS dist_km " +
        "FROM ranked WHERE rk <= 3"),
    ),
  )
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** `pearson_udaf(x, y)` — Pearson correlation as a typed `Aggregator`,
  * registered for SQL (SURVEY §4.4: a demo of the UDAF surface; the
  * built-in `corr` is the production path — this exists so SQL users of
  * the engine can see/extend the aggregation extension point).
  *
  * The buffer carries (n, Σx, Σy, Σx², Σy², Σxy) — associative and
  * commutative, so Spark can partial-aggregate map-side and merge in
  * any order; null inputs are skipped like the built-in.
  */
object PearsonAgg extends Aggregator[(java.lang.Double, java.lang.Double), PearsonBuf, java.lang.Double] {

  override def zero: PearsonBuf = PearsonBuf(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  override def reduce(b: PearsonBuf, in: (java.lang.Double, java.lang.Double)): PearsonBuf =
    if (in._1 == null || in._2 == null) b
    else {
      val x = in._1.doubleValue(); val y = in._2.doubleValue()
      PearsonBuf(b.n + 1, b.sx + x, b.sy + y, b.sxx + x * x, b.syy + y * y, b.sxy + x * y)
    }

  override def merge(a: PearsonBuf, b: PearsonBuf): PearsonBuf =
    PearsonBuf(a.n + b.n, a.sx + b.sx, a.sy + b.sy, a.sxx + b.sxx, a.syy + b.syy, a.sxy + b.sxy)

  override def finish(b: PearsonBuf): java.lang.Double = {
    if (b.n < 2) return null
    val den = math.sqrt((b.n * b.sxx - b.sx * b.sx) * (b.n * b.syy - b.sy * b.sy))
    if (den <= 0.0 || den.isNaN) null
    else java.lang.Double.valueOf((b.n * b.sxy - b.sx * b.sy) / den)
  }

  override def bufferEncoder: Encoder[PearsonBuf] = Encoders.product[PearsonBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Register as `pearson_udaf`: once per session (repeat calls no-op
    * without the registry-REPLACE warning; first call registers
    * unconditionally — [[GraftFunctions.oncePerSession]]).
    */
  def register(spark: SparkSession): Unit =
    GraftFunctions.oncePerSession(spark, "pearson_udaf") {
      spark.udf.register("pearson_udaf", org.apache.spark.sql.functions.udaf(this))
    }
}

final case class PearsonBuf(n: Long, sx: Double, sy: Double, sxx: Double, syy: Double, sxy: Double)

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PearsonAggSpec extends SparkSpec {

  test("pearson_udaf matches built-in corr (and handles nulls / constant cols)") {
    val s = spark; import s.implicits._
    PearsonAgg.register(s)
    val rnd = new scala.util.Random(21)
    val rows = (0 until 500).map { i =>
      val x = rnd.nextDouble() * 10
      (i % 3, Some(x), Some(x * 2 + rnd.nextGaussian()))
    } ++ Seq((0, None, Some(1.0)), (1, Some(2.0), None)) // nulls skipped
    val df = rows.toDF("g", "x", "y")
    val got = df.groupBy("g")
      .agg(
        expr("pearson_udaf(x, y)").as("udaf"),
        corr(col("x"), col("y")).as("builtin"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9, s"group ${r.getInt(0)}")
    }
    // constant column → null (matches corr's NaN-free contract here)
    val const = (0 until 10).map(i => (1, 5.0, i.toDouble)).toDF("g", "x", "y")
    assert(const.agg(expr("pearson_udaf(x, y)")).head().isNullAt(0))
  }
}

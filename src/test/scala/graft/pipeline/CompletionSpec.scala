package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class CompletionSpec extends SparkSpec {

  test("missingCells enumerates exactly the absent grid coordinates") {
    val s = spark; import s.implicits._
    val m = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)).toDF("sample", "probe", "value")
    val missing = Completion.missingCells(m)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(missing == Set((1, 1)))
  }

  test("ALS completion: dense output, observed values preserved, low RMSE on held-out low-rank data (P2)") {
    val s = spark; import s.implicits._
    val rnd = new Random(42)
    val nS = 30; val nP = 20; val rank = 3
    // ground-truth low-rank matrix M = U·Vᵀ
    val u = Array.fill(nS, rank)(rnd.nextGaussian())
    val v = Array.fill(nP, rank)(rnd.nextGaussian())
    def cell(i: Int, j: Int): Double =
      (0 until rank).map(k => u(i)(k) * v(j)(k)).sum
    val all = for { i <- 0 until nS; j <- 0 until nP } yield (i, j, cell(i, j))
    // hold out 15% of cells
    val (held, observed) = all.partition(_ => rnd.nextDouble() < 0.15)
    val obsDF = observed.toDF("sample", "probe", "value")

    val params = Completion.AlsParams(rank = 5, maxIter = 15, regParam = 0.05, numBlocks = 4)
    val completed = Completion.complete(spark, obsDF, params).cache()

    // dense: every (sample, probe) cell present exactly once
    assert(completed.count() == nS.toLong * nP)
    assert(completed.select("sample", "probe").distinct().count() == nS.toLong * nP)

    // observed cells ride through untouched — compare VALUES, not just
    // key membership (key counts are already implied by density above)
    val obsBack = completed.as("c")
      .join(obsDF.as("o"), Seq("sample", "probe"))
      .filter(col("c.value") =!= col("o.value"))
    assert(obsBack.count() == 0, "observed values were altered by completion")

    // held-out recovery RMSE well under the data's own scale
    val heldDF = held.toDF("sample", "probe", "truth")
    val joined = completed.join(heldDF, Seq("sample", "probe"))
    val rmse = math.sqrt(
      joined.select(avg(pow(col("value") - col("truth"), 2))).head().getDouble(0))
    val scale = math.sqrt(all.map(c => c._3 * c._3).sum / all.size)
    assert(rmse < scale * 0.5, s"RMSE $rmse vs scale $scale")
    completed.unpersist()
  }

  test("ALS completion is deterministic under fixed seed") {
    val s = spark; import s.implicits._
    val rnd = new Random(1)
    val obs = (for { i <- 0 until 10; j <- 0 until 8 if rnd.nextDouble() < 0.8 }
      yield (i, j, rnd.nextDouble() * 5)).toDF("sample", "probe", "value")
    val params = Completion.AlsParams(rank = 3, maxIter = 5, regParam = 0.1, numBlocks = 2)
    def runOnce() = Completion.complete(spark, obs, params)
      .orderBy("sample", "probe").collect().map(_.getDouble(2)).toSeq
    assert(runOnce() == runOnce())
  }
}

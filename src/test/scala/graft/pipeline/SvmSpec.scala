package graft.pipeline

import graft.SparkSpec
import scala.util.Random

class SvmSpec extends SparkSpec {

  test("assembleFeatures sorts values by probe id (A7)") {
    val s = spark; import s.implicits._
    // insert probes out of order — vector must come back probe-sorted
    val m = Seq(
      (0, 2, 30.0), (0, 0, 10.0), (0, 1, 20.0),
      (1, 1, 50.0), (1, 2, 60.0), (1, 0, 40.0)).toDF("sample", "probe", "value")
    val f = Svm.assembleFeatures(m).collect()
      .map(r => r.getInt(0) -> r.getAs[org.apache.spark.ml.linalg.Vector]("features"))
      .toMap
    assert(f(0).toArray.toSeq == Seq(10.0, 20.0, 30.0))
    assert(f(1).toArray.toSeq == Seq(40.0, 50.0, 60.0))
  }

  test("assembleFeatures rejects an incomplete matrix") {
    val s = spark; import s.implicits._
    val m = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)).toDF("sample", "probe", "value")
    assertThrows[IllegalArgumentException] { Svm.assembleFeatures(m) }
  }

  test("separable synthetic data: 100% recovery, predictions are ±1.0 (P4)") {
    val s = spark; import s.implicits._
    val rnd = new Random(42)
    val nProbes = 6
    // class decided by probe 0: tumorous clusters at +5, normal at -5
    def mkSample(id: Int, tumorous: Boolean) = {
      val base = if (tumorous) 5.0 else -5.0
      (0 until nProbes).map(p =>
        (id, p, if (p == 0) base + rnd.nextGaussian() * 0.3 else rnd.nextGaussian()))
    }
    val train = (0 until 40).flatMap(i => mkSample(i, i % 2 == 0))
    val test = (40 until 60).flatMap(i => mkSample(i, i % 2 == 0))
    val features = Svm.assembleFeatures((train ++ test).toDF("sample", "probe", "value"))
    val labels = (0 until 40).map(i => (i, i % 2 == 0)).toDF("sample", "tumorous")
    val model = Svm.train(spark, features, labels, Svm.SvmParams(maxIter = 20))
    val preds = Svm.predict(
      model, features.filter($"sample" >= 40)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(preds.size == 20)
    assert(preds.values.forall(p => p == 1.0 || p == -1.0))
    (40 until 60).foreach { i =>
      val expected = if (i % 2 == 0) 1.0 else -1.0
      assert(preds(i) == expected, s"sample $i")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The calibration instrument's own falsifiability spec (VERDICT r17
  * #2): the r17 re-close window demonstrated the bracket blind spot —
  * six same-plan runs sat in a tight 182–213 s RAW band while the
  * normalized column swung 65–175 s, several stamped cal_stable=true,
  * because host load churned faster than the pre/post brackets
  * sampled. `Bench.Calibration` now folds WITHIN-RUN probes (taken
  * every N queries inside the timed passes) into the same spread
  * statistic, so a bracket-fooling window reads unstable. This spec
  * red-proofs exactly that scenario and pins the two-sample behavior
  * every existing consumer (LuadPipeline's e2e row, historical bench
  * artifacts) was adjudicated under.
  */
class CalibrationSpec extends AnyFunSuite {

  test("two-sample Calibration (no mid probes) keeps the historical formula exactly") {
    val c = Bench.Calibration(18.4, 18.7, 32)
    val mean = (18.4 + 18.7) / 2
    assert(math.abs(c.effMean - mean) < 1e-12)
    assert(math.abs(c.spread - math.abs(18.4 - 18.7) / mean) < 1e-12,
      "(max-min)/mean must equal |pre-post|/mean when only the brackets sample")
    assert(c.stable, "a 0.016 spread is calm")
    assert(math.abs(c.normalize(100.0) - 100.0 * mean / 32) < 1e-9)
  }

  test("red-proof: agreeing brackets around a churning middle now read UNSTABLE (the r17 re-close shape)") {
    // the exact blind spot: pre 18.4 / post 18.7 agree (spread 0.016,
    // stamped stable under the bracket-only formula) while a mid-run
    // probe read ~10 effective cores — the load churned between the
    // brackets, so the normalized column was fiction
    val fooled = Bench.Calibration(18.4, 18.7, 32, effMid = Seq(10.0))
    assert(!fooled.stable,
      "a within-run probe diverging from agreeing brackets MUST flip cal_stable to false — " +
        "if this passes as stable, the bracket blind spot is back")
    assert(fooled.spread > 0.15)
    // and the mean now reflects the run's actual average throughput,
    // not just its calm endpoints
    assert(fooled.effMean < Bench.Calibration(18.4, 18.7, 32).effMean)
  }

  test("calm mid probes keep a calm run stable (no false alarms from the new signal)") {
    val calm = Bench.Calibration(18.4, 18.7, 32, effMid = Seq(18.2, 18.9, 18.5))
    assert(calm.stable, s"uniform samples must stay stable (spread ${calm.spread})")
    // and a genuinely loaded-throughout run still reads as such
    val loaded = Bench.Calibration(10.0, 10.5, 32, effMid = Seq(10.2, 9.8))
    assert(loaded.stable, "consistently loaded is STABLE (normalization is then honest)")
    assert(loaded.loadFactor > 3.0)
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._

/** One-off parity check against the reference's checked-in run
  * artifact (`pipeline/output/text.txt/1..8`): 4,844 probe-pair
  * correlation rows with 0.9000089 ≤ r ≤ 0.9960450 from a
  * threshold-0.9 run over the completed 62×21,578 matrix
  * (SURVEY §5.1).
  *
  * MEASURED (round 2): our network step finds 130,907 edges at the
  * same threshold (r ∈ [0.9000000, 1.0]). The divergence is explained
  * by the reference's documented Pearson bugs (SURVEY §8): Q2 — ΣXY
  * pairs the two probes' value lists POSITIONALLY, not by sample key
  * (`PreProcess.scala:71`), decorrelating any pair whose groups
  * iterate samples in different orders; and Q1 — the group key is
  * taken from the last element's sample id (`PreProcess.scala:47-49`).
  * Raw RNA-seq counts share strong library-size correlation, so the
  * sample-ALIGNED statistic correctly finds a dense |r|≥0.9 graph;
  * the artifact's sparse 4,844 edges are an artifact of the
  * misalignment. We therefore pin SEMANTICS (upper triangle, |r| ≥
  * threshold, NaN-guarded — NetworkSpec's synthetic ground-truth
  * recovery) rather than the artifact's edge set, exactly as SURVEY
  * §5.2 pins prediction semantics rather than the buggy 9/22 golden.
  * Run: `runMain graft.pipeline.ArtifactCheck`.
  */
object ArtifactCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val base = "/root/reference/input"
    val config = DefParser.parseFile(s"$base/input.txt")
    val ing = Ingest.ingest(spark, base, config)
    val matrix = ing.matrix.persist()
    val completed = Completion.complete(spark, matrix).persist()
    val edges = Network.pearsonEdgesDense(spark, completed, 0.9).persist()
    val n = edges.count()
    val stats = edges.agg(
      min(abs(col("r"))).as("rmin"), max(abs(col("r"))).as("rmax")).head()
    // min/max over ZERO rows are null — getDouble would NPE instead of
    // printing the zero-edge comparison this main exists to report
    val (rmin, rmax) =
      if (n == 0) (Double.NaN, Double.NaN)
      else (stats.getDouble(0), stats.getDouble(1))
    println(s"ARTIFACT_CHECK edges=$n rmin=$rmin rmax=$rmax " +
      s"(reference artifact: 4844 edges, r in [0.9000089, 0.9960450])")
    spark.stop()
  }
}

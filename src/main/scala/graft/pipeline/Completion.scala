package graft.pipeline

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Missing-entry detection + ALS matrix completion (reference
  * `PreProcess.scala:96-152`, A4/M1/M2/U2/R1).
  *
  * Reference params (`PreProcess.scala:130-138`): rank 10, 10
  * iterations, 100 blocks, lambda 0.9, seed 42.
  *
  * Scale design:
  *  - Missing cells come from a cross join of the distinct sample and
  *    probe id sets anti-joined against observed entries — the exact
  *    relational form of A4's per-group set difference, but with no
  *    per-group driver set and no collect. At 100 TB the cross join is
  *    (dims × dims), not (rows × rows): it only materializes absent
  *    coordinates.
  *  - The reference collects the COMPLETED matrix to the driver and
  *    re-parallelizes it (`PreProcess.scala:163`) — the scalability
  *    killer called out in SURVEY §3.1. Here the completed matrix stays
  *    a DataFrame end to end.
  */
object Completion {

  final case class AlsParams(
      rank: Int = 10,
      maxIter: Int = 10,
      regParam: Double = 0.9,
      numBlocks: Int = 100,
      seed: Long = 42L,
  )

  /** (sample, probe) coordinates present in the full grid but absent
    * from the observed COO matrix.
    */
  def missingCells(matrix: DataFrame): DataFrame = {
    val samples = matrix.select("sample").distinct()
    val probes = matrix.select("probe").distinct()
    samples
      .crossJoin(probes)
      .join(matrix.select("sample", "probe"), Seq("sample", "probe"), "left_anti")
  }

  /** Complete the matrix: observed ∪ ALS-predicted missing cells.
    * Deterministic under the fixed seed. Asserts completeness (the
    * reference silently relies on it for vector assembly,
    * `Trainer.scala:46`; ml-ALS would emit NaN on cold-start ids).
    */
  def complete(
      spark: SparkSession,
      matrix: DataFrame,
      params: AlsParams = AlsParams(),
      // caller-known (nSamples, nProbes), so a pipeline that already
      // counted the dictionaries doesn't pay two more distinct
      // shuffles just for the block sizing (r15 pipeline review)
      cards: Option[(Long, Long)] = None,
  ): DataFrame = {
    val observed = matrix.select("sample", "probe", "value")
    // persist: the emptiness probe and model.transform both consume the
    // cross-join anti-join — without the cache the full-grid enumeration
    // runs twice
    val missing = missingCells(observed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (missing.count() == 0) { missing.unpersist(); return observed }

    // Effective block count scales with the DATA, params.numBlocks is
    // only the cap: the reference's fixed 100 blocks on a 62-sample
    // dimension makes every ALS stage schedule ~100 near-empty tasks
    // and a 100×100-piece block exchange per iteration — measured ~90 s
    // of pure scheduling churn at the reference shape. ~512 ids per
    // block keeps each solve batched. Derived from CARDINALITY ONLY —
    // never core count: ml-ALS's factor init and normal-equation
    // accumulation depend on the blocking, so a core-derived count
    // would make seed-42 results differ across cluster sizes.
    def blocksFor(card: Long): Int =
      math.max(1L, math.min(params.numBlocks.toLong, (card + 511) / 512)).toInt
    val (nSamples, nProbes) = cards.getOrElse((
      observed.select("sample").distinct().count(),
      observed.select("probe").distinct().count()))
    val userBlocks = blocksFor(nSamples)
    val itemBlocks = blocksFor(nProbes)

    val als = new ALS()
      .setUserCol("sample")
      .setItemCol("probe")
      .setRatingCol("value")
      .setRank(params.rank)
      .setMaxIter(params.maxIter)
      .setRegParam(params.regParam)
      .setNumUserBlocks(userBlocks)
      .setNumItemBlocks(itemBlocks)
      .setSeed(params.seed)
      .setColdStartStrategy("nan")
    val model = als.fit(observed)

    // localCheckpoint (eager): materializes predictions ONCE for the
    // NaN guard and every later consumer, truncates the ALS lineage,
    // and its blocks are freed with the RDD — no unpersist bookkeeping
    // leaking into callers
    val predicted = model
      .transform(missing)
      .select(col("sample"), col("probe"), col("prediction").cast("double").as("value"))
      .localCheckpoint()
    missing.unpersist()
    // every sample and probe has >=1 observed cell by construction
    // (a sample only registers with >=1 file) — so no NaN may survive
    val nan = predicted.filter(isnan(col("value"))).count()
    require(nan == 0, s"ALS cold-start produced $nan NaN cells")
    observed.union(predicted)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dedup-family scale audit: empirical LSH / SimHash band-bucket
  * growth across every fixture scale the driver offers.
  *
  * The dedup scale story rests on a claim: candidate generation is
  * bounded because band buckets stay small as the corpus grows —
  * bucket-join cost is Σ|bucket|², so the statistic that matters is
  * the largest bucket and the implied candidate-pair count, NOT the
  * corpus size. This main measures, per scale and per family
  * (MinHash 8×2-perm bands; SimHash 4×8-bit bands; SimHash64 4×16-bit
  * bands), the bucket-count / max-bucket / p99-bucket / Σ|b|·(|b|−1)/2
  * figures and prints one JSON line per (scale, family) for
  * BASELINE.md's record.
  *
  * Usage: runMain graft.DedupScale [sfDir ...]  (default: all three)
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    try {
      dirs.foreach { dir =>
        val sf = new java.io.File(dir).getName
        val nDocs = Tables(spark, dir, "documents").count()

        def report(family: String, buckets: org.apache.spark.sql.DataFrame): Unit = {
          // buckets: one row per (bucket key, n docs in bucket)
          val stats = buckets
            .agg(
              count(lit(1)).as("n_buckets"),
              max(col("n")).as("max_bucket"),
              expr("CAST(percentile(n, 0.99) AS DOUBLE)").as("p99_bucket"),
              sum(expr("n * (n - 1) div 2")).as("cand_pairs"))
            .head()
          println(
            s"""{"metric":"dedup_scale","sf":"$sf","family":"$family","n_docs":$nDocs,""" +
              s""""n_buckets":${stats.getLong(0)},"max_bucket":${stats.getLong(1)},""" +
              s""""p99_bucket":${stats.getDouble(2)},"cand_pairs":${stats.getLong(3)}}""")
        }

        report("minhash_8x2",
          graft.operators.DedupOps.minhashBands(spark, dir)
            .groupBy("band", "sig").agg(count(lit(1)).as("n")))

        val sig32 = SparkEntry.queries("q28_simhash")(spark, dir).localCheckpoint()
        report("simhash32_4x8",
          sig32
            .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 3)")).as("b"))
            .withColumn("bv", expr("shiftright(simhash, 8 * b) & 255"))
            .groupBy("b", "bv").agg(count(lit(1)).as("n")))

        val sig64 = SparkEntry.queries("q28b_simhash64")(spark, dir).localCheckpoint()
        report("simhash64_4x16",
          sig64
            .select(col("doc_id"), col("simhash64"), explode(expr("sequence(0, 3)")).as("b"))
            .withColumn("bv", expr("shiftright(simhash64, 16 * b) & 65535"))
            .groupBy("b", "bv").agg(count(lit(1)).as("n")))
      }
    } finally spark.stop()
  }
}

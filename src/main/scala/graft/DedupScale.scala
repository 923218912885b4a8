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
  *
  * A `dir@xN` argument synthesizes an N× corpus from `dir` by
  * DETERMINISTIC hash-derived token mutation (no RNG): variant k of a
  * document replaces ~20% of its tokens — those where a fixed integer
  * hash of (position, doc_id, k) lands in residue 0 mod 5 — with
  * md5-derived replacements, then re-ids as doc_id·N + k. Each
  * replaced token kills its 3 covering shingles, so variants share a
  * minority of shingles with their parent: the synthesized corpus
  * grows the DISTINCT signature population (what band saturation is
  * about) rather than stacking exact copies into the same buckets.
  * The fixture's 5k docs @ sf0.1 → 50k docs @ x10: one scale step
  * past where SimHash32 already saturated.
  */
object DedupScale {

  /** Materialize the N× mutated corpus under /tmp and return its dir. */
  private def synthesize(spark: org.apache.spark.sql.SparkSession, srcDir: String, xf: Int): String = {
    val out = s"/tmp/graft_dedup_scale/${operators.Relational.datasetKey(srcDir)}_x$xf"
    val base = Tables(spark, srcDir, "documents")
    base
      .crossJoin(spark.range(xf).toDF("k"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn(
        "toks2",
        expr(
          "transform(toks, (t, i) -> CASE WHEN k > 0 AND " +
            "pmod(i * 2654435761 + doc_id * 1000003 * k, 5) = 0 " +
            "THEN substr(md5(concat(t, ':', CAST(doc_id AS STRING), ':', CAST(k AS STRING))), 1, 8) " +
            "ELSE t END)"))
      .select(
        (col("doc_id") * xf + col("k")).as("doc_id"),
        concat_ws(" ", col("toks2")).as("text"),
        col("lang"), col("source"),
        length(concat_ws(" ", col("toks2"))).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  def main(args: Array[String]): Unit = {
    val specs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    try {
      specs.foreach { spec =>
        val (dir, label) = spec.split("@x", 2) match {
          case Array(src, n) =>
            (synthesize(spark, src, n.toInt), s"${new java.io.File(src).getName}_x$n")
          case _ => (spec, new java.io.File(spec).getName)
        }
        val sf = label
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

        // q29c's widened banding: 2 bands × 32 bits (2^32 buckets per
        // band) — the >100k-doc escape hatch. The claim under audit:
        // where 4×16 shows saturation onset at 50k docs, 2×32 bucket
        // occupancy stays ~zero (max bucket = true near-identical
        // collisions, not hash crowding).
        report("simhash64_2x32",
          sig64
            .select(col("doc_id"), col("simhash64"), explode(expr("sequence(0, 1)")).as("b"))
            .withColumn("bv", expr("shiftright(simhash64, 32 * b) & 4294967295"))
            .groupBy("b", "bv").agg(count(lit(1)).as("n")))

        // q142 PPJoin: buckets are the inverted lists candidate
        // generation joins on. `ppjoin_prefix` (rarest-prefix tokens
        // only) vs `inverted_all` (every shingle — what a filterless
        // inverted-index join pays): cand_pairs ratio IS the measured
        // pruning factor, and its growth across scales is the claim
        // under audit.
        val (allSh, prefix, _, _) = graft.operators.DedupOps.ppjoinFrames(spark, dir)
        report("ppjoin_prefix",
          prefix.groupBy("sh").agg(count(lit(1)).as("n")))
        report("inverted_all",
          allSh.groupBy("sh").agg(count(lit(1)).as("n")))

        // q177 containment join: ASYMMETRIC prefix — each doc's
        // L = n−⌈0.8n⌉+1 rarest shingles joined against FULL inverted
        // lists, so the join cost is Σ_sh prefix(sh)·full(sh), not
        // Σ|b|². cand_pairs reports that product (self-matches
        // included — the da≠db filter drops them post-join);
        // max/p99_bucket are the full-list sizes restricted to
        // prefix-occupied shingles. Comparable filterless cost is the
        // inverted_all row above.
        val (csh, cprefix, _, _) =
          graft.operators.DedupOps.containmentFrames(spark, dir)
        val cstats = cprefix.groupBy("sh").agg(count(lit(1)).as("np"))
          .join(csh.groupBy("sh").agg(count(lit(1)).as("nf")), "sh")
          .agg(
            count(lit(1)).as("n_buckets"),
            max(col("nf")).as("max_bucket"),
            expr("CAST(percentile(nf, 0.99) AS DOUBLE)").as("p99_bucket"),
            sum(col("np") * col("nf")).as("cand_pairs"))
          .head()
        println(
          s"""{"metric":"dedup_scale","sf":"$sf","family":"containment_prefix","n_docs":$nDocs,""" +
            s""""n_buckets":${cstats.getLong(0)},"max_bucket":${cstats.getLong(1)},""" +
            s""""p99_bucket":${cstats.getDouble(2)},"cand_pairs":${cstats.getLong(3)}}""")
      }
    } finally spark.stop()
  }
}

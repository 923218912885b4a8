package graft

/** Source-parallelism bench: the fixture parquet files are single
  * row-group, so every scan stage is structurally capped at ONE task
  * regardless of cores (BASELINE.md) — plan parallelism can't show up
  * in scan-bound numbers. This main rewrites the tables into N-file
  * parquet (N row groups → N scan tasks), runs the headline queries
  * against both layouts, and prints one JSON line with both timings:
  * the single- vs multi-row-group delta is the evidence the plans
  * parallelize at the source.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BenchScan [nFiles]
  */
object BenchScan {

  private val headline = Seq(
    "q01_scan_project",
    "q05_join_multiway",
    "q11_agg_hash",
    "q16_window",
    "q21_fingerprint",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nFiles = args.headOption.map(_.toInt).getOrElse(8)
    val multiDir = java.nio.file.Files
      .createTempDirectory("graft_multirg").toString
    val spark = GraftSession.fromEnv()

    // the rewrite is a full dataset copy — delete it even when a run
    // throws, so a failed bench doesn't leak GBs into /tmp
    try {
      // ONE rewrite implementation (RewriteMulti): a private copy here
      // once drifted — it hard-coded its own table list (a new fixture
      // table would be silently omitted) and read events RAW, so on
      // nanos-typed fixtures its multi-file layout carried a different
      // on-disk ts schema than RewriteMulti's and the two "same"
      // layouts benched different decoders
      RewriteMulti.rewrite(spark, sfDir, multiDir, nFiles)

      val specs = SparkEntry.specs.filter(q => headline.contains(q.name))
      // loud on a renamed/removed headline: a silent filter shrink
      // would shift the totals across rounds and read as a layout
      // regression with no error (r13 instrument review)
      require(specs.size == headline.size,
        s"headline queries missing from SparkEntry.specs: " +
          s"${headline.toSet -- specs.map(_.name).toSet}")
      def run(q: QuerySpec, dir: String): Double = {
        val t0 = System.nanoTime()
        q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // warmup both layouts untimed (classloading, codegen, FS cache)
      specs.foreach { q => run(q, sfDir); run(q, multiDir) }

      // min-of-2 + effective-cores bracketing, same protocol as Bench:
      // the per-query single-vs-multi speedups recorded from this main
      // are as small as 1.2×, inside single-shot ±10% noise (r13
      // instrument review)
      val nominal = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
      val calPre = Bench.effectiveCores(nominal)
      def minOf2(dir: String): Seq[(String, Double)] = {
        val p1 = specs.map(q => q.name -> run(q, dir))
        val p2 = specs.map(q => q.name -> run(q, dir)).toMap
        p1.map { case (k, t) => k -> math.min(t, p2(k)) }
      }
      val single = minOf2(sfDir)
      val multi = minOf2(multiDir)
      val calPost = Bench.effectiveCores(nominal)
      def js(xs: Seq[(String, Double)]): String =
        xs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      def r1(v: Double): Double = math.rint(v * 10) / 10
      println(
        s"""{"metric":"scan_parallelism","unit":"sec","n_files":$nFiles,""" +
          s""""single_row_group":${js(single)},"multi_row_group":${js(multi)},""" +
          s""""single_total":${single.map(_._2).sum},"multi_total":${multi.map(_._2).sum},""" +
          s""""effective_cores_pre":${r1(calPre._1)},"effective_cores_post":${r1(calPost._1)}}""")
    } finally {
      GraftSession.rmTree(new java.io.File(multiDir))
      spark.stop()
    }
  }
}

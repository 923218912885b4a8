package graft

/** KMV intersection-sketch error audit (DedupScale's pattern applied
  * to q195): measure the estimator's relative error against the exact
  * per-pair intersection for k ∈ {16, 64, 256} at every fixture scale.
  * The question a 100 TB deployment asks is "how small can the sketch
  * be before the intersection estimate is junk" — 1/√k theory says
  * halving error costs 4× state; this measures it on real pair
  * structure instead of arguing it. Results recorded in BASELINE.md.
  *
  * Usage: runMain graft.KmvScale [sfDir ...]
  */
object KmvScale {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    try {
      for (dir <- dirs; k <- Seq(16, 64, 256)) {
        val rows = operators.ModernSqlOps.kmvIntersect(spark, dir, k)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        val rel = rows.map { case (_, _, exact, est) =>
          math.abs(est - exact) / math.max(exact.toDouble, 1.0)
        }
        val worst = rows.maxBy { case (_, _, exact, est) =>
          math.abs(est - exact) / math.max(exact.toDouble, 1.0)
        }
        println(f"KMV $dir%s k=$k%3d pairs=${rows.length}%2d " +
          f"meanRelErr=${rel.sum / rel.length}%.4f maxRelErr=${rel.max}%.4f " +
          f"worstPair=${worst._1}/${worst._2} exact=${worst._3} est=${worst._4}%.1f")
      }
    } finally spark.stop()
  }
}

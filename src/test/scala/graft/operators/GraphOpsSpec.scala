package graft.operators

import graft.SparkSpec

/** Independent-reimplementation check for q91_pagerank: recompute the
  * 3-iteration power method with plain Scala collections over the
  * collected sf0.001 edge list (1.4k edges — driver-sized) and compare
  * node-for-node. Catches formula drift (damping, dangling handling,
  * iteration count) that the DuckDB oracle — sharing the SQL shape —
  * could conceivably mirror.
  */
class GraphOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q91 pagerank matches a collections reimplementation on sf0.001") {
    val got = graft.SparkEntry.queries("q91_pagerank")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

    // independent edge derivation straight from the parquet files
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = li.map { case (ok, sk) => (ord(ok) * 2, sk * 2 + 1) }.distinct
    val edges = pairs ++ pairs.map { case (c, s) => (s, c) }

    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val nodes = edges.map(_._1).distinct
    var rank = nodes.map(_ -> 1.0d).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2)
      rank = nodes.map { n =>
        val m = in.getOrElse(n, Array.empty[(Long, Long)])
          .map { case (src, _) => rank(src) / outdeg(src) }.sum
        n -> (0.15d + 0.85d * m)
      }.toMap
    }

    assert(got.keySet == rank.keySet)
    val worst = rank.map { case (n, r) => math.abs(got(n) - r) }.max
    assert(worst < 1e-9, s"max |spark - reimpl| = $worst")
    // sanity: ranks bounded below by the teleport term
    assert(got.values.forall(_ >= 0.15d - 1e-12))
  }

  test("q184: incremental-frontier Bellman-Ford == full relax (the r18 A/B's equivalence contract)") {
    // The committed q184 shape is the FULL relax (it won the measured
    // A/B — GraphOps.ssspVariant's scaladoc has the numbers); the
    // incremental frontier stays as the documented alternative. This
    // pins the equivalence argument the adjudication leans on: a
    // non-improved node's contributions already persist in the
    // min-folded dist frame, so relaxing only improved nodes reaches
    // the same <=4-edge shortest paths.
    val dir = "/root/testdata/sf0.001"
    def rows(inc: Boolean): Seq[(Long, Long)] =
      GraphOps.ssspVariant(spark, dir, incremental = inc)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val full = rows(false)
    val incr = rows(true)
    assert(full.nonEmpty && full == incr,
      s"variants diverged: ${full.size} vs ${incr.size} rows, first diff " +
        full.zip(incr).find(p => p._1 != p._2))
  }
}

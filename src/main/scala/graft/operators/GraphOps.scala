package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over relational data: PageRank on the customer ↔
  * supplier trade graph (reference's network-analysis family,
  * `pipeline/Network.scala` neighborhood — this extends it with the
  * canonical web-graph centrality signal a crawl-curation pipeline
  * ranks pages with).
  *
  * Graph: node per customer (id = 2·custkey) and per supplier
  * (id = 2·suppkey + 1); an undirected edge per distinct
  * (customer, supplier) pair that appears in lineitem⋈orders,
  * symmetrized into two directed edges. Rank: 3 fixed power
  * iterations of r ← 0.15 + 0.85·Σ_in r(u)/outdeg(u) from r₀ = 1 —
  * fixed iteration count (not convergence-tested) so the DuckDB
  * oracle can unroll the same arithmetic exactly.
  *
  * Scale notes:
  *  - edge derivation is the heavy part at 100 TB: one equi-join on
  *    orderkey + one distinct on the (cust, supp) pair — both
  *    shuffle-partitioned on well-distributed keys.
  *  - the iteration body is join-on-src + groupBy-dst: the classic
  *    iterative-join shape. Edges and degrees are materialized ONCE
  *    (localCheckpoint) and reused by all 3 iterations — re-deriving
  *    them per iteration would re-scan lineitem 3×. Rank frames stay
  *    (id, rank) pairs — 16 bytes/node of shuffle per iteration,
  *    never the edge list.
  *  - localCheckpoint per iteration truncates lineage so the plan
  *    doesn't grow multiplicatively with iteration count (the classic
  *    iterative-DataFrame pitfall; same treatment as
  *    `pipeline/Network.scala`'s CC loop).
  */
object GraphOps {

  /** Distinct symmetrized trade edges (src, dst). */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** 3 power iterations; returns (node_id, pr) for every node. */
  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(s, dir).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    // symmetrized graph → every node appears as a src
    val nodes = edges.select(col("src").as("id")).distinct().localCheckpoint()
    val contribBase = edges
      .join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    var rank = nodes.withColumn("pr", lit(1.0d))
    for (_ <- 1 to 3) {
      val contrib = contribBase
        .join(rank, contribBase("src") === rank("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("outdeg")).as("m"))
      rank = nodes
        .join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"), (lit(0.15d) + lit(0.85d) * coalesce(col("m"), lit(0.0d))).as("pr"))
        .localCheckpoint()
    }
    rank.select(col("id").as("node_id"), col("pr"))
  }

  private val pagerankSql: String = {
    def iter(prev: String, cur: String): String =
      s"$cur AS (SELECT n.id, 0.15 + 0.85 * coalesce(SUM(r.pr / d.outdeg), 0) AS pr " +
        s"FROM nodes n LEFT JOIN edges e ON e.dst = n.id " +
        s"LEFT JOIN $prev r ON r.id = e.src LEFT JOIN deg d ON d.src = e.src " +
        "GROUP BY n.id)"
    "WITH p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
      "edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p), " +
      "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src), " +
      "nodes AS (SELECT DISTINCT src AS id FROM edges), " +
      "r0 AS (SELECT id, 1.0 AS pr FROM nodes), " +
      s"${iter("r0", "r1")}, ${iter("r1", "r2")}, ${iter("r2", "r3")} " +
      "SELECT id AS node_id, pr FROM r3"
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q91_pagerank", (s, dir) => pagerank(s, dir), Some(pagerankSql))
  )
}

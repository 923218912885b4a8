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

  /** 3 power iterations; returns (node_id, pr) for every node.
    *
    * The graph is symmetrized, so every node has ≥1 in-edge and the
    * per-iteration contribution aggregate already produces a row per
    * node — no nodes-frame left join is needed (the oracle keeps the
    * textbook left-join formulation; results are identical on this
    * graph). Edges are weighted ONCE with 1/outdeg and materialized;
    * each iteration is then one join + one map-side-combinable groupBy.
    * The rank frame is (id, pr) — node-count-sized, far below the edge
    * list — so AQE broadcasts it at this scale; on a 100 TB graph it
    * grows past the broadcast threshold and AQE falls back to a
    * shuffle join keyed on src, which is the right plan there too.
    * 3 iterations keep the un-checkpointed lineage shallow (the
    * N-iteration loop in `pipeline/Network.scala` shows the
    * checkpointed pattern for unbounded iteration counts).
    */
  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    // materialize the distinct edge list ONCE — the degree aggregate and
    // the weighted join both consume it (Catalyst doesn't share aliased
    // subtrees, so an unmaterialized frame would run the lineitem scan +
    // distinct twice)
    val edges = tradeEdges(s, dir).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    val weighted = edges
      .join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0d) / col("outdeg")).as("w"))
      .localCheckpoint()
    var rank = weighted.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(1.0d))
    for (_ <- 1 to 3) {
      rank = weighted
        .join(rank, weighted("src") === rank("id"))
        .groupBy(col("dst").as("id"))
        .agg((lit(0.15d) + lit(0.85d) * sum(col("pr") * col("w"))).as("pr"))
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
    QuerySpec("q91_pagerank", (s, dir) => pagerank(s, dir), Some(pagerankSql)),
    QuerySpec(
      // Item co-occurrence features: per supplier, how many distinct
      // co-suppliers share ≥1 order with it and the total co-occurrence
      // count — the word2vec/item-item-graph construction pass of a
      // recommender or embedding pipeline. Scale shape: the self-join
      // fans out PER ORDER, so output is Σ_orders deg·(deg−1) with deg
      // bounded by order size (single-digit) — never the quadratic
      // per-customer or per-corpus blowup a naive projection would
      // take; both groupBys are map-side combinable.
      "q97_cooccur",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        li.as("a")
          .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.sk") =!= col("b.sk"))
          .groupBy(col("a.sk").as("supplier"), col("b.sk").as("co_supplier"))
          .agg(count(lit(1)).as("n"))
          .groupBy("supplier")
          .agg(
            count(lit(1)).as("n_co_suppliers"),
            sum("n").as("n_cooccurrences"))
      },
      Some(
        "WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem), " +
          "p AS (SELECT a.sk AS supplier, b.sk AS co_supplier, COUNT(*) AS n " +
          "FROM li a JOIN li b ON a.ok = b.ok AND a.sk <> b.sk GROUP BY 1, 2) " +
          "SELECT supplier, COUNT(*) AS n_co_suppliers, " +
          "CAST(SUM(n) AS BIGINT) AS n_cooccurrences FROM p GROUP BY supplier"),
    ),
  )
}

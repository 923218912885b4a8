package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
      // k-CORE decomposition (bounded): iteratively strip nodes whose
      // within-subgraph degree falls below k — the dense-community /
      // spam-cluster extractor (distinct from q38's components, which
      // ignore density, and q155's label propagation, which partitions
      // rather than prunes). k is DATA-DERIVED — the 25th-percentile
      // initial degree, computed integer-exactly from the degree
      // histogram's cumulative counts — because trade-graph degrees
      // grow with corpus scale, so any fixed k degenerates (everyone
      // survives, or everyone drops) at some SF; the adaptive k strips
      // ~25% in round 1 and cascades at EVERY scale. 4 fixed strip
      // rounds (deterministic on both engines whether or not the core
      // has converged; the unbounded loop would use Network.scala's
      // checkpointed pattern). Execution is PEELING with incremental
      // degree updates — the textbook k-core physical plan: a node's
      // degree within the survivor set is deg0 minus its edges into
      // everything removed so far, so each round joins the edge list
      // against only the JUST-REMOVED frame and subtracts. No round's
      // removed frame is provably small (round 1 is ~25% of all nodes;
      // later cascades are bounded only by the rest), so every
      // per-round join is left to planner + AQE, which broadcasts off
      // the frame's real materialized size. The corpus-sized edge list is never
      // re-shuffled per round, unlike the recount formulation this
      // replaced (A/B warm 3rd-rep at sf0.1, same host: peeled 2.2 s
      // vs recount 3.6 s, identical 12,307-row output). k rides as a
      // broadcast SINGLE-ROW cross join (the q108 bounds pattern), so
      // the plan is fully distributed.
      "q208_kcore",
      (s, dir) => {
        val edges = tradeEdges(s, dir).localCheckpoint()
        val deg0 = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        val hist = deg0.groupBy("deg").agg(count(lit(1)).as("cnt"))
        val wc = Window.orderBy("deg")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // r-th smallest degree, r = ceil(n/4): integer-exact disc
        // quantile from cumulative counts on the tiny histogram frame
        val kRow = hist
          .withColumn("cum", sum(col("cnt")).over(wc))
          .withColumn("n", sum(col("cnt")).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .filter(col("cum") >= expr("(n + 3) div 4"))
          .agg(min(col("deg")).as("k"))
        // frame invariant: surviving nodes with their degree WITHIN the
        // surviving subgraph (= deg0 − edges into removed-so-far)
        var frame = deg0.crossJoin(broadcast(kRow)).localCheckpoint()
        for (round <- 1 to 4) {
          val removed = frame.filter(col("deg") < col("k"))
            .select(col("id").as("dst"))
          // NO forced broadcast in ANY round: round 1 strips ~25% of
          // ALL nodes (k is the 25th-percentile degree) and the
          // cascade residue of rounds 2+ is bounded only by the other
          // ~75% — a pathological degree distribution can peel a
          // corpus-proportional slab in any round, and a hint is
          // honored unconditionally. AQE reads the removed frame's
          // REAL materialized size each round and converts the join to
          // broadcast exactly when the residue is small (the usual
          // case from round 2 on), so the hint bought nothing the
          // runtime doesn't already do safely.
          val loss = edges.join(removed, Seq("dst"))
            .groupBy(col("src").as("id")).agg(count(lit(1)).as("lost"))
          frame = frame.filter(col("deg") >= col("k"))
            .join(loss, Seq("id"), "left")
            .withColumn("deg", col("deg") - coalesce(col("lost"), lit(0L)))
            .select("id", "deg", "k").localCheckpoint()
        }
        // deg > 0: the oracle's final recount emits a survivor only if
        // it retains ≥1 edge within the final survivor set (a node
        // isolated by the LAST strip round has deg 0 here and no row
        // there — same set either way)
        frame.filter(col("deg") > 0)
          .select(col("id").as("node_id"), col("deg"), col("k"))
      },
      Some {
        def strip(prevS: String, eCur: String, sCur: String): String =
          s"$eCur AS (SELECT src, dst FROM edges WHERE src IN (SELECT id FROM $prevS) " +
            s"AND dst IN (SELECT id FROM $prevS)), " +
            s"$sCur AS (SELECT src AS id FROM $eCur, kq GROUP BY src, k " +
            "HAVING COUNT(*) >= k)"
        "WITH p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
          "edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p), " +
          "d0 AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src), " +
          "h AS (SELECT deg, COUNT(*) AS cnt FROM d0 GROUP BY deg), " +
          "hc AS (SELECT deg, CAST(SUM(cnt) OVER (ORDER BY deg " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
          "CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h), " +
          "kq AS (SELECT MIN(deg) AS k FROM hc WHERE cum >= (n + 3) // 4), " +
          "s0 AS (SELECT id FROM d0, kq WHERE deg >= k), " +
          strip("s0", "e1", "s1") + ", " +
          strip("s1", "e2", "s2") + ", " +
          strip("s2", "e3", "s3") + ", " +
          "ef AS (SELECT src, dst FROM edges WHERE src IN (SELECT id FROM s3) " +
          "AND dst IN (SELECT id FROM s3)) " +
          "SELECT src AS node_id, CAST(COUNT(*) AS BIGINT) AS deg, CAST(k AS BIGINT) AS k " +
          "FROM ef, kq GROUP BY src, k"
      },
    ),
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
          // both self-join sides re-derive the distinct otherwise —
          // one materialization, two in-memory reads
          .localCheckpoint()
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
    QuerySpec(
      // Top-k backbone graph + per-node triangle participation. The raw
      // supplier co-occurrence graph densifies toward complete as data
      // grows (sf0.1: 454k edges over 1000 nodes, 124M triangles — a
      // scale trap); the standard fix is a k-NN backbone: keep each
      // node's k=3 strongest edges (weight DESC, neighbor-id tie-break
      // → deterministic), symmetrize, then enumerate triangles with the
      // ordered two-hop join (x<y<z, each counted once). Work is
      // bounded by n·k² regardless of raw density. Per-node counts come
      // from exploding the three corners — no second pass over edges.
      "q109_backbone_triangles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
          .localCheckpoint() // two self-join sides
        val pairs = li.as("a")
          .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.sk") =!= col("b.sk"))
          .groupBy(col("a.sk").as("src"), col("b.sk").as("dst"))
          .agg(count(lit(1)).as("w"))
        val rk = Window.partitionBy("src").orderBy(col("w").desc, col("dst"))
        val edges = pairs
          .withColumn("rk", row_number().over(rk)).filter(col("rk") <= 3)
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          // referenced three times by the triangle join — without this
          // the whole pair-gen + window + distinct re-runs per side
          .localCheckpoint()
        val tri = edges.as("e1")
          .join(edges.as("e2"), col("e1.b") === col("e2.a"))
          .join(edges.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        tri.select(explode(array(col("x"), col("y"), col("z"))).as("supplier"))
          .groupBy("supplier")
          .agg(count(lit(1)).as("n_triangles"))
      },
      Some(
        "WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem), " +
          "p AS (SELECT a.sk AS src, b.sk AS dst, COUNT(*) AS w FROM li a " +
          "JOIN li b ON a.ok = b.ok AND a.sk <> b.sk GROUP BY 1, 2), " +
          "t AS (SELECT src, dst FROM (SELECT src, dst, ROW_NUMBER() OVER " +
          "(PARTITION BY src ORDER BY w DESC, dst) AS rk FROM p) WHERE rk <= 3), " +
          "e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM t), " +
          "tr AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 " +
          "JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) " +
          "SELECT u AS supplier, COUNT(*) AS n_triangles FROM " +
          "(SELECT unnest([x, y, z]) AS u FROM tr) GROUP BY 1"),
    ),
    QuerySpec(
      // Link-prediction features: top-100 supplier pairs by Jaccard
      // overlap of their order sets. Pairs are generated per order
      // (fan-out bounded by lines-per-order, so pair generation is
      // linear in lineitem, never suppliers²); degrees are a tiny
      // broadcast; the top-k cut is exact cross-engine — jaccard is ONE
      // double division of exact ints (bit-identical both engines) and
      // (a, b) breaks all remaining ties.
      "q110_link_prediction",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
          .localCheckpoint() // degree agg + two self-join sides
        val deg = li.groupBy(col("sk")).agg(count(lit(1)).as("d"))
        val pairs = li.as("x")
          .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
          .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
          .agg(count(lit(1)).as("w"))
        pairs
          .join(broadcast(deg.withColumnRenamed("sk", "a").withColumnRenamed("d", "da")), "a")
          .join(broadcast(deg.withColumnRenamed("sk", "b").withColumnRenamed("d", "db")), "b")
          .select(col("a"), col("b"), col("w"),
            (col("w").cast("double") / (col("da") + col("db") - col("w")).cast("double"))
              .as("jaccard"))
          .orderBy(col("jaccard").desc, col("a"), col("b"))
          .limit(100)
      },
      Some(
        "WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem), " +
          "deg AS (SELECT sk, COUNT(*) AS d FROM li GROUP BY 1), " +
          "p AS (SELECT x.sk AS a, y.sk AS b, COUNT(*) AS w FROM li x " +
          "JOIN li y ON x.ok = y.ok AND x.sk < y.sk GROUP BY 1, 2) " +
          "SELECT p.a, p.b, w, CAST(w AS DOUBLE) / CAST(da.d + db.d - w AS DOUBLE) " +
          "AS jaccard FROM p JOIN deg da ON p.a = da.sk JOIN deg db ON p.b = db.sk " +
          "ORDER BY jaccard DESC, p.a, p.b LIMIT 100"),
    ),
    QuerySpec(
      // Synchronous label propagation (community detection, Raghavan
      // et al. 2007): every node starts as its own community; each of
      // 3 fixed rounds reassigns it to the most frequent label among
      // its neighbors (min label on ties — the determinism rule that
      // makes synchronous LPA reproducible, where the classic
      // random-order variant is not). Per round: ONE edges⋈labels
      // join + ONE combinable (dst,label) count + ONE argmax — the
      // same iterative-join shape as q91; the labels frame stays
      // node-sized, edges are materialized once, and localCheckpoint
      // per round truncates the plan. Fixed-round sync LPA is the
      // 100 TB form: convergence-tested async LPA needs a driver loop
      // (q38b's pattern) but the per-round dataflow is identical.
      "q155_label_propagation",
      (s, dir) => {
        // NOT pre-partitioned on src: localCheckpoint's LogicalRDD
        // reports unknown partitioning to Catalyst, so a
        // repartition(src) before the checkpoint adds an upfront
        // shuffle WITHOUT removing the per-round join exchanges
        // (plan-verified r11; warm A/B 2.90 vs 3.44 s was host drift,
        // eff-cores 26 vs 20). Carrying partitioning across rounds
        // needs a bucketed catalog table (q54's machinery) — not worth
        // it for 3 fixed rounds at this shape.
        val edges = tradeEdges(s, dir).localCheckpoint()
        var labels = edges.select(col("src").as("id")).distinct()
          .withColumn("lbl", col("id"))
        // 3 fixed rounds: lineage stays shallow, so no per-round
        // checkpoint (q91's reasoning); an unbounded-round variant
        // would checkpoint like pipeline/Network.scala's CC loop
        for (_ <- 1 to 3) {
          labels = edges.join(labels, col("src") === col("id"))
            .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
            // lexicographic struct max = highest count, then (via the
            // negated label) lowest label — the argmax without a window
            .groupBy(col("dst"))
            .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
            .select(col("dst").as("id"), (-col("m.neg")).as("lbl"))
        }
        labels.select(
          col("id").as("node_id"), col("lbl").as("community"),
          count(lit(1)).over(Window.partitionBy("lbl")).cast("bigint")
            .as("community_size"))
      },
      Some {
        def iter(prev: String, c: String, l: String): String =
          s"$c AS (SELECT e.dst AS id, l.lbl, COUNT(*) AS cnt " +
            s"FROM edges e JOIN $prev l ON l.id = e.src GROUP BY 1, 2), " +
            s"$l AS (SELECT id, lbl FROM $c QUALIFY " +
            "row_number() OVER (PARTITION BY id ORDER BY cnt DESC, lbl ASC) = 1)"
        "WITH p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
          "edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p), " +
          "l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges), " +
          s"${iter("l0", "c1", "l1")}, ${iter("l1", "c2", "l2")}, ${iter("l2", "c3", "l3")} " +
          "SELECT id AS node_id, lbl AS community, " +
          "CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size FROM l3"
      },
    ),
    QuerySpec(
      // Multi-source BFS hop distance — "everything within 3 hops of
      // the seed set", the reachability/ego-network query (fraud
      // rings, influence radius). Level-synchronous frontier
      // expansion: each round joins the PREVIOUS frontier only (not
      // the whole dist frame) against the once-materialized edge
      // list, then folds new nodes in with a combinable min-agg; a
      // node reached twice keeps its earliest hop. 3 keyed
      // join+agg rounds, checkpointed like q91/q155 — the frontier
      // frame is nodes-sized, edges never move after round 0. The
      // oracle walks the same graph with a recursive CTE.
      "q169_bfs_hops",
      (s, dir) => {
        val edges = tradeEdges(s, dir).localCheckpoint()
        val seeds = Seq(2L, 4L, 6L, 8L, 10L)
        var dist = edges.select(col("src").as("id")).distinct()
          .filter(col("id").isin(seeds: _*))
          .withColumn("d", lit(0L))
          .localCheckpoint(true)
        for (round <- 1 to 3) {
          val next = edges
            .join(dist.filter(col("d") === (round - 1)), col("src") === col("id"))
            .select(col("dst").as("id")).distinct()
            .withColumn("d", lit(round.toLong))
          dist = dist.unionByName(next)
            .groupBy("id").agg(min(col("d")).as("d"))
            .localCheckpoint(true)
        }
        dist.select(col("id"), col("d").as("hops"))
      },
      Some(
        "WITH RECURSIVE p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
          "edges AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p), " +
          "bfs(id, d) AS (SELECT DISTINCT src, 0 FROM edges WHERE src IN (2, 4, 6, 8, 10) " +
          "UNION SELECT e.dst, b.d + 1 FROM bfs b JOIN edges e ON e.src = b.id WHERE b.d < 3) " +
          "SELECT id, CAST(MIN(d) AS BIGINT) AS hops FROM bfs GROUP BY 1"),
    ),
    QuerySpec(
      // Bounded-hop weighted shortest path (Bellman-Ford, 4 relaxation
      // rounds) — q169's BFS generalized to weighted edges: edge cost
      // = the (cust, supp) lineitem count, path cost = sum along the
      // path, a node keeps its cheapest ≤4-edge path from the seed
      // set. Each round is ONE keyed join of the once-materialized
      // edge list against the nodes-sized dist frame plus a
      // combinable min-agg, checkpointed per round so lineage stays
      // flat — the level-synchronous Bellman-Ford shape that scales
      // (Pregel does exactly this with incremental frontiers; the
      // fixed round count keeps the oracle expressible as chained
      // CTEs rather than an exploding path enumeration). Costs stay
      // BIGINT end-to-end, so relaxation is exact on both engines and
      // min() needs no float tolerance.
      "q184_weighted_sssp",
      (s, dir) => ssspVariant(s, dir, incremental = false),
      Some {
        def iter(prev: String, nm: String): String =
          s"$nm AS (SELECT id, MIN(d) AS d FROM (" +
            s"SELECT id, d FROM $prev UNION ALL " +
            s"SELECT e.dst, p.d + e.w FROM $prev p JOIN edges e ON e.src = p.id" +
            ") GROUP BY 1)"
        "WITH p AS (SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s, " +
          "CAST(COUNT(*) AS BIGINT) AS w " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2), " +
          "edges AS (SELECT c AS src, s AS dst, w FROM p UNION ALL SELECT s, c, w FROM p), " +
          "d0 AS (SELECT DISTINCT src AS id, CAST(0 AS BIGINT) AS d FROM edges " +
          "WHERE src IN (2, 4, 6, 8, 10)), " +
          s"${iter("d0", "d1")}, ${iter("d1", "d2")}, ${iter("d2", "d3")}, ${iter("d3", "d4")} " +
          "SELECT id, CAST(d AS BIGINT) AS cost FROM d4"
      },
    ),
  )

  /** q184's body, both relaxation shapes for the r18 A/B (VERDICT r17
    * #4). `incremental = false` is the committed shape: every round
    * relaxes the FULL nodes-sized dist frame against the checkpointed
    * edges. `incremental = true` is q169's frontier form — relax only
    * nodes whose cost improved last round, at the price of one extra
    * nodes-sized left join + checkpoint per round to compute the
    * frontier. The two are output-identical by the standard
    * Bellman-Ford argument: a node whose cost did not improve was
    * already relaxed at that cost in an earlier round, and its
    * contributions persist in the monotone min-folded dist frame.
    * Measured (BASELINE.md r18, q208 discipline — 15,999 output rows
    * asserted identical, interleaved reps, cal 19.2/17.2): full relax
    * won EVERY rep at sf0.1 — warm-3rd 3.07 s vs 3.52 s (full reps
    * 3.18/3.16/3.07; incremental 3.78/4.04/3.52). On this dense
    * 4-round trade graph the frontier barely shrinks (most nodes keep
    * improving through round 4), so the extra nodes-sized join +
    * checkpoint per round costs more than the smaller relax input
    * saves; the incremental form pays off only when frontiers collapse
    * (deep graphs, many rounds — q169's BFS, where reached-at-hop IS
    * the frontier for free). Full relax stays the committed plan.
    */
  private[graft] def ssspVariant(
      s: SparkSession, dir: String, incremental: Boolean): DataFrame = {
    val edges = weightedTradeEdges(s, dir).localCheckpoint()
    val seeds = Seq(2L, 4L, 6L, 8L, 10L)
    var dist = edges.select(col("src").as("id")).distinct()
      .filter(col("id").isin(seeds: _*))
      .withColumn("d", lit(0L))
      .localCheckpoint(true)
    var frontier = dist
    for (_ <- 1 to 4) {
      val relaxed = edges
        .join(if (incremental) frontier else dist, col("src") === col("id"))
        .select(col("dst").as("id"), (col("d") + col("w")).as("d"))
      val next = dist.unionByName(relaxed)
        .groupBy("id").agg(min(col("d")).as("d"))
        .localCheckpoint(true)
      if (incremental) {
        frontier = next
          .join(dist.withColumnRenamed("d", "d_prev"), Seq("id"), "left")
          .filter(col("d_prev").isNull || col("d") < col("d_prev"))
          .select(col("id"), col("d"))
          .localCheckpoint(true)
      }
      dist = next
    }
    dist.select(col("id"), col("d").as("cost"))
  }

  /** [[tradeEdges]] with an integral weight: the lineitem count behind
    * each (customer, supplier) pair, symmetrized. One groupBy replaces
    * the distinct — same single shuffle.
    */
  private def weightedTradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .agg(count(lit(1)).as("w"))
    pairs.select(col("c").as("src"), col("s").as("dst"), col("w"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst"), col("w")))
  }
}

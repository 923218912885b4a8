package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Regression guards for the plan shapes the 100 TB story depends on.
  * PlanAuditSpec rejects catastrophic shapes (cartesians) everywhere;
  * this spec pins the POSITIVE properties of representative queries —
  * pushed filters, pruned read schemas, bounded exchange counts — so a
  * refactor that silently un-pushes a predicate or adds a shuffle fails
  * here, not in a 100× production slowdown.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString.replaceAll("\\s+", " ")

  test("q61 (TPC-H Q6): all three predicate families reach the parquet scan") {
    val p = plan("q61_tpch_q6")
    assert(p.contains("PushedFilters:"), p.take(400))
    val pushed = p.substring(p.indexOf("PushedFilters:"))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.take(400).contains(c), s"$c not pushed: ${pushed.take(400)}")
  }

  test("q01: read schema is pruned to the two projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"), p.take(400))
    val rs = p.substring(p.indexOf("ReadSchema"))
    assert(rs.take(200).contains("l_orderkey") && rs.take(200).contains("l_quantity"), rs.take(200))
    assert(!rs.take(200).contains("l_extendedprice"), s"unpruned scan: ${rs.take(200)}")
  }

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("q11 (hash agg): exactly one shuffle (partial agg before the exchange)") {
    val p = plan("q11_agg_hash")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
  }

  test("q70 (5-way star): dims broadcast, shuffles only for the final agg/sort") {
    val p = plan("q70_tpch_q7")
    assert(countOccurrences(p, "BroadcastHashJoin") == 5, p.take(800))
    assert(countOccurrences(p, "SortMergeJoin") == 0, p.take(800))
    // one hash exchange for the 3-key agg + one range exchange for the
    // ORDER BY — anything more means a join stopped broadcasting
    assert(countOccurrences(p, "Exchange hashpartitioning") <= 1, p.take(800))
  }

  test("q63 (TPC-H Q18): top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q63_tpch_q18")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q87 (CDC merge): a small change-set anti-join broadcasts — base is never shuffled") {
    // the query carries NO broadcast hint (the fixture's change set is
    // fact-proportional; BroadcastConventionSpec): this asserts the
    // SMALL-regime plan, where the planner picks BHJ off the change
    // set's real parquet stats. ScaleDegradationSpec asserts the
    // other regime (threshold −1 → shuffle join, zero broadcasts).
    val p = plan("q87_merge_upsert")
    assert("BroadcastHashJoin \\S+, \\S+, LeftAnti".r.findFirstIn(p).isDefined, p.take(800))
    assert(countOccurrences(p, "Exchange hashpartitioning") == 0,
      s"merge shuffled the base table: ${p.take(800)}")
  }

  test("q110 (link prediction): degree joins broadcast; top-k never globally sorts") {
    val p = plan("q110_link_prediction")
    assert(countOccurrences(p, "BroadcastHashJoin") >= 2, p.take(800))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 cut is a global sort: ${p.take(800)}")
  }

  test("q48 (bloom blocklist): probe is codegen'd might_contain, not a Scala UDF") {
    val p = plan("q48_bloom_blocklist")
    assert(p.contains("might_contain"), p.take(800))
    assert(!p.contains("ScalaUDF") && !"\\bUDF\\(".r.findFirstIn(p).isDefined,
      s"bloom probe fell out of codegen into a closure UDF: ${p.take(800)}")
  }

  test("q124 (per-group top-k): WindowGroupLimit bounds the rank windows") {
    // Spark's rank-filter pushdown keeps per-partition window state at
    // k rows instead of sorting whole groups — the property that makes
    // the window-based top-k shapes survive 100 TB groups; both the
    // salted stage and the final stage must carry it
    val p = plan("q124_balanced_resample")
    assert(countOccurrences(p, "WindowGroupLimit") >= 2,
      s"rank-filter pushdown lost: ${p.take(800)}")
  }

  test("q103 (z-score): the stats frame broadcasts back — no second full shuffle of events") {
    val p = plan("q103_zscore_outliers")
    assert(countOccurrences(p, "BroadcastHashJoin") == 1, p.take(800))
    assert(countOccurrences(p, "SortMergeJoin") == 0, p.take(800))
  }

  test("q153 (PIT features): ONE user_id shuffle serves every feature window") {
    // the feature-store claim: all three point-in-time features ride a
    // single sort/exchange on the entity key — a second
    // events-sized hashpartitioning exchange means a feature forked
    // its own shuffle
    val p = plan("q153_pit_features")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(1200))
  }

  test("q149 (sweep): the corpus-sized windows are hour-partitioned; only the tiny offsets frame is global") {
    // the distributed-prefix-sum claim: exactly one single-partition
    // exchange (the hours-sized offsets frame), never the boundary
    // corpus
    val p = plan("q149_concurrency_sweep")
    assert(countOccurrences(p, "Exchange SinglePartition") == 1, p.take(1200))
  }

  test("q152 (k-anonymity): both ladder count frames broadcast back — rows never shuffle") {
    val p = plan("q152_k_anonymity")
    assert(countOccurrences(p, "BroadcastHashJoin") == 2, p.take(1200))
    assert(countOccurrences(p, "SortMergeJoin") == 0, p.take(1200))
  }

  test("q41b (native as-of): merge walk over exchanged+sorted children") {
    val p = plan("q41b_asof_native")
    assert(p.contains("AsOfJoin"), p.take(1200))
    assert(!p.contains("Union") && !p.contains("Window"), p.take(1200))
  }

  test("q159 (geo distance join): blocked equi-join on cells, never a nested loop") {
    val p = plan("q159_geo_distance_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"geo blocking fell back to all-pairs: ${p.take(800)}")
  }

  test("q160/q164 (geo kNN, inverted index): WindowGroupLimit bounds the rank cut") {
    for (q <- Seq("q160_geo_knn", "q164_inverted_index"))
      assert(plan(q).contains("WindowGroupLimit"),
        s"$q rank filter not pushed into the window: ${plan(q).take(800)}")
  }

  test("q163 (weighted sample): global top-20 is TakeOrderedAndProject, not a sort") {
    val p = plan("q163_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"E-S top-k became a global sort: ${p.take(800)}")
  }

  test("q166 (skyline): phase-1 windows are bucket-partitioned — the corpus never single-partitions") {
    // two partitioned phase-1 windows (by bucket) + two phase-2
    // windows on the frontier-sized survivors; the assert is that
    // SOME window carries the bucket partition key, i.e. the local
    // pruning phase didn't collapse into the global pass
    val p = plan("q166_skyline")
    assert(p.contains("windowspecdefinition(b"),
      s"phase-1 skyline window lost its bucket partitioning: ${p.take(1200)}")
  }

  test("q181 (unpivot): melting is a zero-shuffle narrow transform") {
    val p = plan("q181_unpivot")
    assert(countOccurrences(p, "Exchange") == 0,
      s"unpivot plan shuffles: ${p.take(800)}")
    // the 1-in-10 sample predicate reaches the scan
    assert(p.contains("PushedFilters:"), p.take(800))
  }

  test("q182 (z-order): interleave is in-scan arithmetic — one exchange for the final agg") {
    val p = plan("q182_zorder_locality")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("ScalaUDF"), s"interleave fell out of codegen: ${p.take(800)}")
  }

  test("q178 (group regression): both dims broadcast — the fact table shuffles only on the group key") {
    val p = plan("q178_group_regression")
    assert(countOccurrences(p, "BroadcastHashJoin") == 2, p.take(800))
    assert(countOccurrences(p, "SortMergeJoin") == 0, p.take(800))
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
  }

  test("q190 (path trigrams): top-20 is TakeOrderedAndProject; both LEADs share one Window node") {
    val p = plan("q190_path_trigrams")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(countOccurrences(p, "Window") == 1,
      s"same-spec LEADs split into multiple window passes: ${p.take(800)}")
  }

  test("q192 (RI audit): every FK edge joins broadcast — fact tables never shuffle") {
    val p = plan("q192_ri_audit")
    assert(countOccurrences(p, "BroadcastHashJoin") == 5, p.take(1200))
    assert(countOccurrences(p, "SortMergeJoin") == 0, p.take(1200))
  }

  test("q196 (2-pass median): the rescan is bin-pruned at the source and the offset cut is TakeOrdered") {
    val p = plan("q196_exact_median_2pass")
    // the second pass's plan: bin predicate pushed to the parquet scan
    // (as a FLOOR filter it won't reach PushedFilters, but it must at
    // least be a scan-adjacent Filter, not post-shuffle) + bounded
    // TakeOrderedAndProject — never a global sort of the column
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Exchange rangepartitioning"),
      s"median fell back to a global sort: ${p.take(800)}")
  }

  test("q198 (deletion cascade): the fact hop is a broadcast semi-join over the materialized key set") {
    val p = plan("q198_deletion_cascade")
    // hop 1 (orders ⋉ forget-set) is localCheckpoint-materialized so
    // its key set computes once for both the manifest count and hop 2
    // — it appears here as the ExistingRDD scan; hop 2 (lineitem ⋉
    // affected orders) carries NO hint (the frame is fact-proportional
    // — BroadcastConventionSpec), so this BHJ is the PLANNER's choice
    // off the checkpointed frame's real size: the small-regime plan.
    // ScaleDegradationSpec pins the threshold −1 regime (shuffle
    // join). Nothing may sort-merge here at this scale
    assert("BroadcastHashJoin \\S+, \\S+, LeftSemi".r.findAllIn(p).size == 1, p.take(1200))
    assert(p.contains("Scan ExistingRDD"), p.take(1200))
    assert(countOccurrences(p, "SortMergeJoin") == 0, p.take(1200))
  }

  test("q204 (growth accounting): ledger classes fold in ONE aggregate — no pivot second shuffle (r16 review)") {
    // Dataset.pivot (even with pinned values) plans a pivotfirst
    // second aggregate + exchange — the q36b adjudication — and q204's
    // classified frame is users×weeks-sized, so the extra shuffle has
    // real stakes at 100 TB. Red under the pre-fix .pivot() form.
    val p = plan("q204_growth_accounting").toLowerCase
    assert(!p.contains("pivotfirst"),
      s"q204 re-grew a Dataset.pivot two-shuffle aggregate: ${p.take(800)}")
    // non-vacuity: Dataset.pivot on an equivalent tiny frame DOES plan
    // pivotfirst — proving the token this guard greps for is the one
    // Spark actually emits for the avoided shape
    val s = spark; import s.implicits._
    val pivotPlan = Seq(("2024-01-01", "new"), ("2024-01-01", "retained"))
      .toDF("w", "cls")
      .groupBy("w").pivot("cls", Seq("new", "retained", "resurrected")).count()
      .queryExecution.executedPlan.toString.toLowerCase
    assert(pivotPlan.contains("pivotfirst"),
      "Dataset.pivot no longer plans pivotfirst — re-adjudicate the q36b/q204 convention")
  }
}

package graft.operators

import graft.SparkSpec

/** The 100 TB degradation proof behind the round-11 hint removals.
  *
  * BroadcastConventionSpec guarantees textually that no `broadcast()`
  * hint sits on a corpus-derived frame; this spec asserts the same
  * thing PHYSICALLY: with `autoBroadcastJoinThreshold = -1` — the
  * situation at scale, where no fact-derived frame fits in executor
  * memory — each query that used to carry a fact-proportional hint
  * must now plan its fact-side joins as SHUFFLE joins (a hint is
  * honored regardless of the threshold, so an un-hinted
  * BroadcastExchange surviving threshold −1 would mean a size
  * assumption smuggled past the convention spec), and no query may
  * degrade to a nested-loop or cartesian fallback.
  *
  * q208 is covered only up to its returned frame: its per-round peel
  * joins execute eagerly into localCheckpoints during construction
  * (under AQE, which honors the same threshold at runtime), so the
  * returned plan contains no joins to inspect — its hint-free
  * degradation is covered by BroadcastConventionSpec plus the
  * recorded warm-rep A/B (BASELINE.md round-11 freeze 4).
  */
class ScaleDegradationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** (query, require a shuffle join in the returned plan).
    * All four expect ZERO BroadcastExchange nodes: q87/q204 carry no
    * hints at all, and q198's request-batch forget-set hint sits
    * inside the eagerly-checkpointed hop-1 frame, leaving the
    * fact-sized hop-2 semi-join — the one that must shuffle — in the
    * returned plan.
    */
  private val cases = Seq(
    ("q87_merge_upsert", true),
    ("q198_deletion_cascade", true),
    ("q204_growth_accounting", true),
    ("q208_kcore", false))

  test("with broadcasts disabled, de-hinted queries degrade to shuffle joins") {
    val s = spark
    val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      cases.foreach { case (name, requireShuffleJoin) =>
        val plan = graft.SparkEntry.queries(name)(s, sf)
          .queryExecution.executedPlan.toString
        val got = "BroadcastExchange".r.findAllIn(plan).size
        assert(got == 0,
          s"$name: found $got BroadcastExchange node(s) under threshold " +
            s"-1 — an un-hinted broadcast here means a hidden size " +
            s"assumption:\n$plan")
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          s"$name degraded to a nested-loop/cartesian plan:\n$plan")
        if (requireShuffleJoin)
          assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
            s"$name shows no shuffle join under threshold -1:\n$plan")
      }
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}

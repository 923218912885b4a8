package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Independent-witness properties for the round-9 session operators:
  * each test re-derives the operator's contract a DIFFERENT way (a
  * sequential driver loop, a brute count, an alternate sharding) so a
  * bug in the distributed decomposition can't hide behind an oracle
  * that shares its structure.
  */
class NewOpsPropertySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q149: distributed prefix-sum sweep == sequential driver sweep") {
    val out = SparkEntry.queries("q149_concurrency_sweep")(spark, sfDir)
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap

    // independent witness: one sequential pass over the sorted
    // boundary list — the textbook single-machine sweep
    // micros, not Timestamp.getTime millis: fixture timestamps carry
    // microsecond precision and the sweep's order is on the full value
    val iv = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(unix_micros(min(col("ts"))).as("s"), unix_micros(max(col("ts"))).as("e"))
      .collect()
    val bounds = iv.flatMap { r =>
      val u = r.getLong(0)
      Seq((r.getLong(2), 1, u), (r.getLong(3), -1, u))
    }.sortBy { case (t, d, u) => (t, -d, u) } // starts before ends, user tiebreak
    var cum = 0L
    val hourly = scala.collection.mutable.Map.empty[Long, Long]
    for ((t, d, _) <- bounds) {
      cum += d
      val hrMillis = (t - t % 3600000000L) / 1000L
      hourly(hrMillis) = math.max(hourly.getOrElse(hrMillis, Long.MinValue), cum)
    }
    assert(out == hourly.toMap)
  }

  test("q148: every stratum keeps exactly ceil(0.2 * n) docs") {
    val kept = SparkEntry.queries("q148_stratified_sample")(spark, sfDir)
      .groupBy("lang", "source").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = Tables(spark, sfDir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kept.keySet == totals.keySet, "a stratum lost ALL its docs")
    for ((k, n) <- totals)
      assert(kept(k) == (n + 4) / 5, s"stratum $k: kept ${kept(k)} of $n")
  }

  test("q150: quantile estimates are invariant to the sharding key") {
    def run(key: org.apache.spark.sql.Column): Seq[(Double, Double, Long)] =
      ModernSqlOps.quantileShardMerge(spark, sfDir, key)
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq.sorted
    val byMonth = run(date_format(col("o_orderdate"), "yyyy-MM"))
    val byPriority = run(col("o_orderpriority"))
    val oneShard = run(lit("all"))
    assert(byMonth == byPriority && byMonth == oneShard)
  }

  test("q152: every published non-suppressed group has >= 10 members") {
    val out = SparkEntry.queries("q152_k_anonymity")(spark, "/root/testdata/sf0.01")
    val groups = out.groupBy("gen_nation", "gen_segment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((nat, seg, n) <- groups if !(nat == "*" && seg == "*"))
      assert(n >= 10, s"published group ($nat, $seg) has only $n members")
    // the ladder actually engages on this fixture: all three levels occur
    val levels = out.select("gen_level").distinct().collect().map(_.getLong(0)).toSet
    assert(levels.contains(0L) && (levels.contains(1L) || levels.contains(2L)))
  }

  test("q153: features match a brute-force strictly-before recount") {
    val out = SparkEntry.queries("q153_pit_features")(spark, sfDir)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4), r.getLong(5))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tm"),
        col("event_type"), col("value"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val purchases = ev.filter(_._4 == "purchase")
    assert(out.size == purchases.length)
    for ((u, eid, t, _, _) <- purchases) {
      val hist = ev.filter(e => e._1 == u && (e._3 < t || (e._3 == t && e._2 < eid)))
      val lastView = hist.filter(_._4 == "view").sortBy(e => (e._3, e._2)).lastOption.map(_._5)
      val clicks1h = ev.count(e =>
        e._1 == u && e._4 == "click" && e._3 >= t - 3600000000L && e._3 < t).toLong
      val priorBuys = hist.count(_._4 == "purchase").toLong
      assert(out(eid) == ((lastView, clicks1h, priorBuys)), s"purchase $eid of user $u")
    }
  }
}

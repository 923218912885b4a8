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

  test("q167: delta-join maintenance is cutoff-invariant (all-old, mid, all-new agree)") {
    def result(cutoff: String): Map[String, (Double, Long)] =
      ModernSqlOps.incrementalJoin(spark, sfDir, cutoff)
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val mid = result("1998-06-01")
    // degenerate cutoffs make three of the four terms empty — any
    // double-count or dropped term in the delta algebra shows up as a
    // disagreement between the three decompositions
    assert(result("1900-01-01") == mid, "all-new decomposition diverged")
    assert(result("2100-01-01") == mid, "all-old decomposition diverged")
  }

  /** The q165 cut rule, reimplemented directly (plain chars, no SQL). */
  private def cdcChunks(text: String): Seq[String] = {
    def isBoundary(i: Int): Boolean = { // i = 1-based end of the 4-gram
      val h = text(i - 4).toInt * 2248091 + text(i - 3).toInt * 17161 +
        text(i - 2).toInt * 131 + text(i - 1).toInt
      h % 16 == 0
    }
    val cuts = 0 +: (4 until text.length).filter(isBoundary) :+ text.length
    cuts.sliding(2).collect { case Seq(a, b) => text.substring(a, b) }.toSeq
  }

  test("q165: content-defined boundaries are edit-local — a prefix edit preserves the tail chunks") {
    val texts = Tables(spark, sfDir, "documents")
      .select("text").limit(10).collect().map(_.getString(0))
    for (t <- texts if t.length > 20) {
      val orig = cdcChunks(t)
      val edited = cdcChunks("zq9x " + t)
      // every chunk after the FIRST original boundary must reappear
      // verbatim — that locality is the entire point of CDC (a
      // fixed-width chunker shifts every downstream boundary instead)
      val tail = orig.drop(1)
      val editedSet = edited.groupBy(identity).view.mapValues(_.size)
      val tailCounts = tail.groupBy(identity).view.mapValues(_.size)
      for ((c, n) <- tailCounts)
        assert(editedSet.getOrElse(c, 0) >= n,
          s"chunk '${c.take(30)}…' lost after a prefix edit")
    }
    // and the Spark query agrees with this direct reimplementation on
    // total chunk count
    val sparkChunks = SparkEntry.queries("q165_cdc_chunks")(spark, sfDir)
      .agg(sum(col("n_chunks"))).collect()(0).getLong(0)
    val direct = Tables(spark, sfDir, "documents")
      .select("text").collect().map(r => cdcChunks(r.getString(0)).size.toLong).sum
    assert(sparkChunks == direct)
  }

  test("q166: skyline is union-distributive — merge of partial skylines equals the direct skyline") {
    val pts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        col("n_chars").cast("long"),
        expr("CAST(floor(100000.0 * size(array_distinct(split(text, ' '))) " +
          "/ size(split(text, ' '))) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(p: (Long, Long, Long), qs: Seq[(Long, Long, Long)]): Boolean =
      qs.exists(q => (q._2 > p._2 && q._3 >= p._3) || (q._2 >= p._2 && q._3 > p._3))
    def skyline(s: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
      s.filterNot(p => dominated(p, s)).toSet
    val direct = skyline(pts.toSeq)
    val (a, b) = pts.toSeq.partition(_._1 % 2 == 0)
    val merged = skyline((skyline(a) ++ skyline(b)).toSeq)
    assert(merged == direct, "two-phase merge lost or invented a frontier point")
    // and the Spark operator returns exactly this frontier
    val got = SparkEntry.queries("q166_skyline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == direct)
  }

  test("q169: BFS hop distances equal GraphX ShortestPaths over the same graph") {
    import org.apache.spark.graphx.{Edge, Graph}
    val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
    val ord = Tables(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("c"),
        (col("l_suppkey") * 2 + 1).cast("long").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = spark.sparkContext.parallelize(
      pairs.flatMap { case (c, s) => Seq(Edge(c, s, 1), Edge(s, c, 1)) }.toSeq)
    val graph = Graph.fromEdges(edges, 0)
    val seeds = Seq(2L, 4L, 6L, 8L, 10L)
    val sp = org.apache.spark.graphx.lib.ShortestPaths.run(graph, seeds)
    val expected = sp.vertices.collect().flatMap { case (id, m) =>
      val ds = m.values
      if (ds.isEmpty) None
      else Some(id -> ds.min.toLong)
    }.filter(_._2 <= 3).toMap
    val got = SparkEntry.queries("q169_bfs_hops")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"sizes: got=${got.size} expected=${expected.size}")
  }
}

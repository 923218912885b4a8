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

  test("q179: binned-frame Mann-Whitney == naive sequential rank computation") {
    val Seq((gna, gnb, gu, gz)) = SparkEntry.queries("q179_mann_whitney")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq

    // witness: collect the raw sample, bin, midrank and fold in plain
    // Scala — no windows, no cumulative-count reconstruction
    val sample = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .filter(col("value").isNotNull) // the query's population (r17)
      .select(col("event_type"), floor(col("value") * 10.0).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val binned = sample.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L; var ra2 = 0L; var ties = 0L
    var na = 0L; var nb = 0L
    for ((_, rows) <- binned) {
      val cnt = rows.length.toLong
      val ca = rows.count(_._1 == "click").toLong
      ra2 += ca * (2 * cum + cnt + 1)
      ties += cnt * cnt * cnt - cnt
      na += ca; nb += cnt - ca; cum += cnt
    }
    val u = (ra2 - na * (na + 1)).toDouble / 2.0
    val nn = na + nb
    val sigma2 = na.toDouble * nb / 12.0 *
      ((nn + 1).toDouble - ties.toDouble / (nn.toDouble * (nn - 1)))
    val z = BigDecimal((u - na.toDouble * nb / 2.0) / math.sqrt(sigma2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((gna, gnb) == (na, nb))
    assert(gu == u, s"U: $gu vs $u")
    assert(math.abs(gz - z) <= 1e-9, s"z: $gz vs $z")
  }

  test("q179 excludes NULL-valued measurements (cross-engine NULL-bin ordering divergence, r17)") {
    // A NULL-valued click has no rank: pre-fix it formed a NULL bin
    // that Spark's ASC window put FIRST (NULLS FIRST) while DuckDB's
    // default put LAST — silently divergent midranks, invisible to the
    // gate (fixtures carry no NULL values). RED pre-fix: n_a counted
    // the NULL row (3, not 2) and every midrank below shifted by one.
    val s2 = spark; import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q179_nullval")
    try {
      val ts = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
      Seq[(Long, java.sql.Timestamp, Long, String, java.lang.Double)](
        (1L, ts, 1L, "click", 1.0),
        (2L, ts, 2L, "click", null), // the unranked measurement
        (3L, ts, 3L, "click", 2.0),
        (4L, ts, 4L, "purchase", 1.5))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val Seq(row) = SparkEntry.queries("q179_mann_whitney")(spark, dir.toString)
        .collect().toSeq
      assert((row.getLong(0), row.getLong(1)) == ((2L, 1L)),
        s"the NULL-valued click must not enter the sample: $row")
      // bins 10, 15, 20 → midranks 1, 2, 3; R_A = 1 + 3 → U = 4 − 3 = 1
      assert(row.getDouble(2) == 1.0, s"U over the 3 ranked rows: $row")
    } finally graft.GraftSession.rmTree(dir.toFile)
  }

  test("q209 mw_rank probe pins the shared midrank population filter (r18: the third oracle-blind class, gate-visible)") {
    // The probe's gated values: degenerate key 1 (one NULL measurement,
    // excluded → bins 10, 20 → 2·R_A = 1·2 = 2) and control key 2
    // (NULL-free → 2·R_A = 2 + 4 = 6). The oracle computes the same
    // filtered arithmetic, so these ARE the hash-gated cells.
    val rows = SparkEntry.queries("q209_degenerate_probes")(spark, sfDir)
      .filter(col("probe") === "mw_rank")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(rows == Map(1L -> 2.0, 2L -> 6.0), s"gated mw_rank values: $rows")
    // Falsifiability: the UNFILTERED shape (the pre-r17 q179 bug, the
    // regression the probe exists to catch) ranks the NULL bin FIRST
    // under Spark's ASC default, shifting the degenerate key to 6.0 —
    // which the oracle's filtered 2.0 would hash-reject. If this stops
    // differing, NULL bins stopped ranking and the probe is dead.
    val s2 = spark; import s2.implicits._
    val unfiltered = Seq(
      (1L, Some(1.0), 1L), (1L, None, 1L), (1L, Some(2.0), 0L))
      .toDF("k", "value", "is_a")
      .select(col("k"), floor(col("value") * lit(10.0)).cast("long").as("v"), col("is_a"))
      .groupBy("k", "v")
      .agg(count(lit(1)).as("cnt"), sum(col("is_a")).as("ca"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("r2", lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
      .groupBy("k").agg(sum(col("ca") * col("r2")).cast("double").as("ra2"))
      .head().getDouble(1)
    assert(unfiltered == 6.0,
      s"the unfiltered NULL-bin shape must shift the rank sum (got $unfiltered) — " +
        "if it reads 2.0 the probe can no longer detect a regressed population filter")
  }

  test("q179 u2 arithmetic: decimal n_a product survives past the bigint overflow point (r15 ADVICE)") {
    val s = spark; import s.implicits._
    // One synthetic aggregate row at n_a = 3.1e9 — past bigint's
    // n_a*(n_a+1) overflow point (~3.03e9), far below the decimal
    // path's documented ~1e12 rows/bin. Exercises the exact u2
    // expression shape from q179 (can't be driven through the full
    // query: 3.1e9 input rows). u2 = ra2 - n_a*(n_a+1) = 42 exactly.
    val na = 3100000000L
    val ra2 = BigDecimal(na) * BigDecimal(na + 1) + 42 // 9.61e18 > Long.MaxValue
    val agg = Seq((ra2, na)).toDF("ra2_raw", "n_a")
      .select(col("ra2_raw").cast("decimal(38,0)").as("ra2"), col("n_a"))
    val fixed = agg.select(
      (col("ra2") - col("n_a").cast("decimal(38,0)") * (col("n_a") + lit(1L))).as("u2"))
      .head().getDecimal(0)
    assert(BigDecimal(fixed) == BigDecimal(42))
    // falsifiability: the pre-fix shape (bigint product, then decimal
    // subtraction) must NOT reach the exact value — under ANSI it
    // throws, non-ANSI it wraps. If this ever starts passing, Spark
    // widened the product itself; retire the cast and this guard.
    val old = scala.util.Try(
      agg.select((col("ra2") - col("n_a") * (col("n_a") + lit(1L))).as("u2"))
        .head().getDecimal(0))
    assert(old.isFailure || BigDecimal(old.get) != BigDecimal(42),
      "bigint n_a*(n_a+1) no longer overflows at 3.1e9 — the decimal cast is redundant")
  }

  test("q207 cusum arithmetic: decimal products survive past the bigint overflow point (r16 review)") {
    val s = spark; import s.implicits._
    // One synthetic scored row at n = 2e5 days, cum = 6e13 events —
    // n*cum = 1.2e19 > Long.MaxValue (9.22e18), far below the decimal
    // path's 1e38. t*tot = 2e18 stays in range, so the true statistic
    // |S| = |1.2e19 - 2e18| = 1e19. Exercises the exact s_abs
    // expression shape from q207 (unreachable through the full query:
    // ~6e13 input rows).
    val agg = Seq((200000L, 60000000000000L, 2L, 1000000000000000000L))
      .toDF("n", "cum", "t", "tot")
    val fixed = agg.select(
      abs(col("n").cast("decimal(38,0)") * col("cum") -
        col("t").cast("decimal(38,0)") * col("tot")).as("s_abs"))
      .head().getDecimal(0)
    assert(BigDecimal(fixed) == BigDecimal("10000000000000000000"),
      s"decimal s_abs wrong: $fixed")
    // falsifiability: the pre-fix all-BIGINT shape must NOT reach the
    // exact value — under ANSI (the Spark 4 default) the n*cum product
    // throws; non-ANSI it wraps, and with |S| = 1e19 > 2^63 the wrap
    // does NOT cancel in the subtraction (abs comes out 8.45e18). If
    // this ever starts passing, Spark widened the product itself;
    // retire the decimal casts and this guard.
    val old = scala.util.Try(
      agg.select(abs(col("n") * col("cum") - col("t") * col("tot")).as("s_abs"))
        .head().getLong(0))
    assert(old.isFailure || BigDecimal(old.get) != BigDecimal("10000000000000000000"),
      "bigint n*cum no longer overflows at 1.2e19 — the decimal casts are redundant")
  }

  test("q207 reporting cast is LOUD past int64: int64Report names the query and contract (r16 ADVICE)") {
    val s = spark; import s.implicits._
    // In-range decimals cast cleanly through the guard...
    val inRange = Seq("5", "9223372036854775807").toDF("raw")
      .select(TemporalOps.int64Report(
        col("raw").cast("decimal(38,0)"), "q207_cusum_changepoint", "max_abs_cusum").as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(inRange == Seq(5L, Long.MaxValue), s"in-range values must pass through: $inRange")
    // ...and one past Long.MaxValue dies with the NAMED contract error,
    // not an opaque CAST_OVERFLOW. Red under the pre-fix bare cast:
    // that shape throws too (so the falsifiability check below pins
    // it), but its message names neither the query nor the contract.
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val over = Seq("9223372036854775808").toDF("raw")
      .select(col("raw").cast("decimal(38,0)").as("s_abs"))
    val e = intercept[Exception] {
      over.select(TemporalOps.int64Report(
        col("s_abs"), "q207_cusum_changepoint", "max_abs_cusum").as("v")).collect()
    }
    assert(messages(e).exists(m => m.contains("q207_cusum_changepoint") &&
      m.contains("int64 reporting contract")),
      s"guard must name the query and contract: ${messages(e).mkString(" | ").take(300)}")
    val bare = scala.util.Try(over.select(col("s_abs").cast("bigint")).collect())
    assert(bare.isFailure && !messages(bare.failed.get).exists(_.contains("q207")),
      "the bare cast no longer throws past int64 (or started naming q207) — re-adjudicate the guard")
    // NULL input passes through as NULL, it does NOT fire the loud arm
    // (r17 ADVICE red-proof: pre-fix, concat null-propagated and
    // raise_error died with a message-less error on a NULL statistic)
    val nullIn = Seq(Option.empty[String]).toDF("raw")
      .select(TemporalOps.int64Report(
        col("raw").cast("decimal(38,0)"), "q207_cusum_changepoint", "max_abs_cusum").as("v"))
      .collect()
    assert(nullIn.length == 1 && nullIn.head.isNullAt(0),
      "int64Report over a NULL statistic must yield NULL, not a message-less raise_error")
  }

  test("q108: degenerate single-value input bins to 0, not the null-skipping LEAST artifact (r16 review)") {
    val s = spark; import s.implicits._
    // All values identical -> hi = lo -> the unguarded bin expression
    // divides by zero width; LEAST ignores the resulting NULL on BOTH
    // engines and lands every row in the TOP bin (19). The guarded
    // query declares bin 0 instead.
    val dir = java.nio.file.Files.createTempDirectory("graft_q108_degenerate")
    try {
      val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      Seq((1L, 7L, "click", ts0, 42.0, "{}"), (2L, 8L, "view", ts0, 42.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val bins = graft.SparkEntry.queries("q108_histogram")(spark, dir.toString)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bins == Map(0L -> 2L), s"degenerate histogram: $bins")
      // falsifiability: the unguarded expression shape on the same
      // frame yields bin 19 (non-ANSI; under ANSI the IEEE NaN path
      // diverges even harder) — proving the guard is load-bearing
      val ev = Tables.events(spark, dir.toString).select(col("value"))
      val bounds = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      val old = scala.util.Try(
        ev.crossJoin(org.apache.spark.sql.functions.broadcast(bounds))
          .select(least(lit(19L),
            floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / lit(20.0d))))
            .cast("bigint").as("bin"))
          .select("bin").distinct().collect().map(r => Option(r.get(0))).toSet)
      assert(old.isFailure || old.get != Set(Some(0L)),
        "the unguarded bin expression now yields 0 on zero-width bounds — retire the guard")
    } finally graft.GraftSession.rmTree(dir.toFile)
  }

  test("q184: relational Bellman-Ford == naive in-memory relaxation") {
    val edges = {
      val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .agg(count(lit(1)).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      p ++ p.map { case (c, s, w) => (s, c, w) }
    }
    var dist = Seq(2L, 4L, 6L, 8L, 10L)
      .filter(s => edges.exists(_._1 == s)).map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val relaxed = edges.flatMap { case (src, dst, w) =>
        dist.get(src).map(d => dst -> (d + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    val got = SparkEntry.queries("q184_weighted_sssp")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist, s"sizes: got=${got.size} expected=${dist.size}")
  }

  test("q191: windowed weighted median == naive BigDecimal accumulation") {
    val rows = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        expr("CAST(l_extendedprice AS DECIMAL(18,2))"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val byQty = rs.groupBy(_._2).view.mapValues(
        _.map(x => BigDecimal(x._3)).sum).toSeq.sortBy(_._1)
      val total = byQty.map(_._2).sum
      var cum = BigDecimal(0)
      val med = byQty.collectFirst {
        case (q, w) if { cum += w; cum * 2 >= total } => q
      }.get
      flag -> (med, total.toDouble)
    }
    val got = SparkEntry.queries("q191_weighted_median")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected, s"$got vs $expected")
  }

  test("q196: two-pass selection == sort-the-lot median") {
    val prices = Tables(spark, sfDir, "lineitem")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val r = (prices.length + 1) / 2
    val Seq((n, med)) = SparkEntry.queries("q196_exact_median_2pass")(spark, sfDir)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(n == prices.length)
    assert(med == prices(r - 1), s"$med vs ${prices(r - 1)}")
  }

  test("q197: exploded MAU == naive per-day trailing-window distinct count") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).cast("string"))
      .distinct().collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val days = ud.map(_._2).distinct
    val expected = days.map { d =>
      d.toString -> ud.filter { case (_, ed) =>
        !ed.isAfter(d) && !ed.isBefore(d.minusDays(29))
      }.map(_._1).distinct.length.toLong
    }.toMap
    val got = SparkEntry.queries("q197_stickiness")(spark, sfDir)
      .select("d", "mau").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q200: funnel stages are monotone and the dedup keeper count matches a Scala recompute") {
    val out = SparkEntry.queries("q200_curation_funnel")(spark, sfDir).collect()
    for (r <- out) {
      val (nIn, nQ, nD, nS) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nIn >= nQ && nQ >= nD && nD >= nS, s"non-monotone funnel row: $r")
    }
    // keeper witness: replicate corpus + stages sequentially in Scala
    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = base ++ base.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + 1000000L, t.toUpperCase + " ") }
    def qOk(t: String) = {
      val n = t.length
      n >= 60 && n <= 5000 &&
        t.count(_.isDigit).toDouble / n < 0.3
    }
    val quality = corpus.filter { case (_, t) => qOk(t) }
    val keepers = quality
      .groupBy { case (_, t) => t.toLowerCase.replaceAll("\\s+", " ").trim }
      .values.map(_.map(_._1).min).toSet
    assert(out.map(_.getLong(3)).sum == keepers.size.toLong)
    assert(out.map(_.getLong(2)).sum == quality.length.toLong)
  }

  test("q195: KMV estimate == Scala recompute from raw hashes; sketches merge losslessly") {
    val k = 64
    val du = Tables.events(spark, sfDir)
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
      .withColumn("h", xxhash64(col("u")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = du.groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    def sketch(hs: Set[Long]): Seq[Long] = hs.toSeq.sorted.take(k)
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.length
      (ta, tb) = (types(i), types(j))
    } yield {
      val (ha, hb) = (byType(ta).map(_._2), byType(tb).map(_._2))
      val (sa, sb) = (sketch(ha).toSet, sketch(hb).toSet)
      val union = ha ++ hb
      val uk = sketch(union)
      // MERGEABILITY: k-smallest of (sketchA ∪ sketchB) IS the union
      // sketch — the property that lets shards combine without raw data
      assert(sketch(sa ++ sb) == uk, s"($ta,$tb): merged sketch != union sketch")
      val m = uk.count(h => sa(h) && sb(h)).toLong
      val nU = uk.length.toLong
      val nHatU = if (nU < k) nU.toDouble
        else (k - 1).toDouble / (uk.max.toDouble / math.pow(2.0, 64) + 0.5)
      val interHat = m.toDouble / math.min(nU, k) * nHatU
      val exact = byType(ta).map(_._1).intersect(byType(tb).map(_._1)).size.toLong
      (ta, tb) -> ((exact, math.abs(interHat - exact) <= exact * 0.35))
    }).toMap
    val got = SparkEntry.queries("q195_kmv_intersect")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("q185: windowed truncated EWMA == sequential recursion (exact on the truncated form, bounded vs the true filter)") {
    val w16 = Iterator.iterate(1.0)(_ * 0.75).take(16).toSeq
    val byUser = Tables.events(spark, sfDir)
      .filter(pmod(col("user_id"), lit(50)) === 0)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val got = SparkEntry.queries("q185_ewma")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(got.nonEmpty)
    for ((u, evs) <- byUser) {
      val vals = evs.map(_._4)
      // true recursive filter, for the truncation bound
      val rec = vals.tail.scanLeft(vals.head)((y, x) => 0.25 * x + 0.75 * y)
      for (i <- vals.indices) {
        val lags = (0 to math.min(15, i)).map(k => vals(i - k))
        val num = lags.zip(w16).map { case (x, w) => w * x }.sum
        val den = lags.zip(w16).map(_._2).sum
        val expected = BigDecimal(num / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val g = got((u, evs(i)._2))
        assert(math.abs(g - expected) <= 1e-9, s"user $u idx $i: $g vs $expected")
        // past warm-up, the dropped tail weighs (3/4)^16 ≈ 1% of the
        // worst-case swing (~490): the truncated filter must track the
        // true recursion within that budget (~15 absolute here)
        if (i >= 16)
          assert(math.abs(g - rec(i)) <= 15.0,
            s"truncated EWMA drifted from the true filter: $g vs ${rec(i)}")
      }
    }
  }
}

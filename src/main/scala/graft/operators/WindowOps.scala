package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-time windowing over `events` — the batch semantics of the
  * streaming surface (graft.streaming runs the same window specs as
  * Structured Streaming queries; these batch twins are what the DuckDB
  * oracle can check).
  *
  * Scale: `window()` is a projection (each row computes its bucket) +
  * one hash aggregate on (bucket, keys) — map-side combinable, one
  * shuffle. Sliding windows multiply rows by windows-per-event (here
  * 2×) BEFORE the aggregate, which is the honest cost of overlap.
  */
object WindowOps {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q103's z-score with the zero-variance degenerate DECLARED: a
    * constant-valued group has sd = 0.0 exactly (not NULL), and under
    * the session's ANSI default Spark throws DIVIDE_BY_ZERO on the 0.0
    * divisor where DuckDB's x/0 is NULL. The guard declares the same
    * semantics — no z without variance (r16 ANSI-division sweep).
    * Shared with q209's degenerate probe so the gate exercises THIS
    * expression, not a copy.
    */
  private[graft] def safeZ(v: Column, m: Column, sd: Column): Column =
    when(sd =!= 0.0d, (v - m) / sd)

  /** q185's final weighted division with the no-support degenerate
    * DECLARED: den = 0.0 exactly when no non-null lag is in reach —
    * ANSI throws where DuckDB NULLs; the no-support row is ewma NULL
    * (r16 ANSI-division sweep). Shared with q209's degenerate probe.
    */
  private[graft] def ewmaDiv(num: Column, den: Column): Column =
    round(when(den =!= 0.0d, num / den), 6)

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      // pivot as pinned conditional aggregation: Dataset.pivot (even
      // with pinned values) plans TWO shuffles (pre-agg on (key,
      // pivot-col) then pivot_first on key — measured); the manual
      // count(when(...)) form is ONE map-side-combinable shuffle, which
      // is the plan you want at 100 TB
      "q36b_pivot",
      (s, dir) => {
        val aggs = eventTypes.map(t =>
          count(when(col("event_type") === t, 1)).as(t))
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(aggs.head, aggs.tail: _*)
      },
      Some(
        "SELECT user_id, " + eventTypes.map(t =>
          s"COUNT(*) FILTER (event_type = '$t') AS $t").mkString(", ") +
          " FROM events GROUP BY user_id"),
    ),
    QuerySpec(
      "q34_window_tumbling",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
          .select(
            col("window.start").as("w_start"), col("event_type"),
            col("n"), col("sum_value")),
      Some(
        "SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, event_type, " +
          "COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
          "FROM events GROUP BY 1, 2"),
    ),
    QuerySpec(
      "q35_window_sliding",
      (s, dir) =>
        // 1h windows sliding every 30min — every event lands in 2
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
          .select(col("window.start").as("w_start"), col("n"), col("n_users")),
      Some(
        // a sliding grid = union of the two offset tumbling grids
        "WITH g AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, user_id FROM events " +
          "UNION ALL " +
          "SELECT time_bucket(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTE) AS w_start, user_id FROM events) " +
          "SELECT w_start, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users FROM g GROUP BY 1"),
    ),
    QuerySpec(
      "q36_window_session",
      (s, dir) => {
        // sessionization: per-user, a >30-minute silence starts a new
        // session (batch twin of streaming session_window). Two window
        // functions + one aggregate — all hash-partitioned by user.
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn(
            "new_sess",
            when(
              col("prev_ts").isNull ||
                col("ts").cast("long") - col("prev_ts").cast("long") > 1800,
              1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(byUser))
          .groupBy("user_id", "session_id")
          .agg(
            min(col("ts")).as("sess_start"),
            max(col("ts")).as("sess_end"),
            count(lit(1)).as("n_events"))
      },
      Some(
        "WITH l AS (SELECT user_id, event_id, ts, " +
          "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
          "m AS (SELECT *, CASE WHEN prev_ts IS NULL " +
          "OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_sess FROM l), " +
          "sess AS (SELECT *, SUM(new_sess) OVER " +
          "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM m) " +
          "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, " +
          "MIN(ts) AS sess_start, MAX(ts) AS sess_end, COUNT(*) AS n_events " +
          "FROM sess GROUP BY 1, 2"),
    ),
    QuerySpec(
      // Time-interval RANGE frame: trailing-7-day revenue per customer —
      // the rolling-metric shape. Spark's rangeBetween is numeric-only,
      // so the order key is epoch DAYS (o_orderdate is midnight-aligned;
      // TIMESTAMP_NTZ also refuses a direct epoch-seconds cast) with a
      // ±7 bound; the oracle states the same frame as RANGE BETWEEN
      // INTERVAL. Peers (equal timestamps) are included by BOTH
      // formulations — that's what makes the two equivalent.
      // Exact-decimal window sum.
      "q76_rolling_interval",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
          .rangeBetween(-7, 0)
        Tables(s, dir, "orders").select(
          col("o_orderkey"),
          col("o_custkey"),
          sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w)
            .cast("double").as("rolling_7d"))
      },
      Some(
        "SELECT o_orderkey, o_custkey, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (" +
          "PARTITION BY o_custkey ORDER BY o_orderdate " +
          "RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) " +
          "AS rolling_7d FROM orders"),
    ),
    QuerySpec(
      // UNPIVOT (q36b's inverse): wide columns → (attr, val) rows via
      // stack — a zero-shuffle map-side reshape (each input row emits
      // its k attribute rows in place). The oracle states the same
      // reshape as UNION ALL.
      "q77_unpivot",
      (s, dir) =>
        Tables(s, dir, "part").select(
          col("p_partkey"),
          expr("stack(2, 'retailprice', CAST(p_retailprice AS DOUBLE), " +
            "'size', CAST(p_size AS DOUBLE))").as(Seq("attr", "val"))),
      Some(
        "SELECT p_partkey, 'retailprice' AS attr, " +
          "CAST(p_retailprice AS DOUBLE) AS val FROM part " +
          "UNION ALL " +
          "SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part"),
    ),
    QuerySpec(
      // Month-over-month growth per nation: the reporting time-series
      // shape (aggregate to a monthly grain, then lag-delta along it).
      // Revenue sums over DECIMAL casts (exact cross-engine, like q55);
      // the growth ratio divides the exact sums as doubles on both
      // sides. Scale shape: dims broadcast, one combinable groupBy on
      // (nation, month), then a window over nation-partitioned months —
      // the series is months-long, so the window state is trivial.
      "q102_mom_growth",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables(s, dir, "orders")
          .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("month"))
          .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("rev"))
        val w = Window.partitionBy("n_name").orderBy("month")
        // zero-base guard (r17 division sweep): a month whose revenue
        // sums to exactly 0.00 (all-zero order totals — free/promo
        // ledgers are realistic) makes the growth base 0.0 — ANSI
        // throws where DuckDB's x/0 is NULL; growth off a zero base is
        // undefined, so it is declared NULL. (The first month's NULL
        // prev was already NULL-safe.)
        val prevD = col("prev").cast("double")
        monthly
          .withColumn("prev", lag(col("rev"), 1).over(w))
          .select(
            col("n_name"), col("month"),
            col("rev").cast("double").as("revenue"),
            when(prevD =!= 0.0d,
              (col("rev").cast("double") - prevD) / prevD).as("mom_growth"))
      },
      Some(
        "WITH m AS (SELECT n_name, date_trunc('month', o_orderdate) AS month, " +
          "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2) " +
          "SELECT n_name, month, CAST(rev AS DOUBLE) AS revenue, " +
          "(CAST(rev AS DOUBLE) - CAST(LAG(rev) OVER (PARTITION BY n_name ORDER BY month) AS DOUBLE)) " +
          "/ CAST(LAG(rev) OVER (PARTITION BY n_name ORDER BY month) AS DOUBLE) AS mom_growth " +
          "FROM m"),
    ),
    QuerySpec(
      // Per-group z-score outlier flagging (|z| > 3 vs the event-type
      // distribution) — the numeric-outlier filter of a data-quality
      // pass. Group stats are a combinable aggregate on a LOW-cardinality
      // key (broadcasts back); the flagging pass is scan-speed. Sample
      // stddev on both engines. Boundary stability: the hard |z| > 3 cut
      // could in principle flip membership if a value's z differed
      // across engines by summation order, but the fixture keeps every
      // value far from the cut — measured min ||z| - 3| is 3.7e-2 /
      // 1.6e-3 / 2.2e-4 at sf0.001/0.01/0.1, ~8 orders of magnitude
      // above the ~1e-12 cross-engine float-reduction noise, and
      // ASSERTED >= 1e-6 per scale by BoundaryMarginSpec so fixture
      // drift onto the boundary fails a spec, not the oracle gate.
      "q103_zscore_outliers",
      (s, dir) => {
        val stats = Tables.events(s, dir)
          .groupBy("event_type")
          .agg(avg("value").as("m"), stddev_samp(col("value")).as("sd"))
        Tables.events(s, dir)
          .join(broadcast(stats), "event_type")
          // zero-variance guard lives in the shared safeZ (NULL z →
          // excluded by the filter, identically on both engines)
          .withColumn("z", safeZ(col("value"), col("m"), col("sd")))
          .filter(abs(col("z")) > 3.0d)
          .select(col("event_id"), col("event_type"), col("value"), col("z"))
      },
      Some(
        "WITH s AS (SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd " +
          "FROM events GROUP BY 1) " +
          "SELECT event_id, event_type, value, (value - m) / sd AS z " +
          "FROM events JOIN s USING (event_type) WHERE ABS((value - m) / sd) > 3"),
    ),
    QuerySpec(
      // Fixed-bin (20) equi-width histogram of `value` with data-derived
      // bounds — the numeric-profiling shape. Bounds are a SINGLE-ROW
      // aggregate broadcast into the binning scan (same shape as q104's
      // spine); the histogram itself is a ≤20-group combinable groupBy.
      // The bin formula is written identically on both engines — same
      // IEEE-double op sequence → identical floor results; max-value
      // rows clamp into the last bin on both sides. The hi = lo guard
      // declares the degenerate single-value slice: unguarded, under
      // the session's ANSI default the zero-width division THROWS
      // DIVIDE_BY_ZERO (ANSI errors even on DOUBLE divisors — verified,
      // not IEEE), and under non-ANSI it nulls, where LEAST *ignores*
      // the null on BOTH engines and silently lands every row in the
      // TOP bin (19) — a crash or an artifact, never a decision (r16
      // review). Convention: bin 0.
      "q108_histogram",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("value"))
        val bounds = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        ev.crossJoin(broadcast(bounds))
          .select(
            when(col("hi") === col("lo"), lit(0L))
              .otherwise(least(lit(19L),
                floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / lit(20.0d)))))
              .cast("bigint").as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"))
      },
      Some(
        "WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events) " +
          "SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE " +
          "LEAST(19, FLOOR((value - lo) / ((hi - lo) / 20.0))) END AS BIGINT) " +
          "AS bin, COUNT(*) AS n FROM events CROSS JOIN b GROUP BY 1"),
    ),
    QuerySpec(
      // Robust outlier flagging via median absolute deviation — the
      // heavy-tail-safe complement of q103's z-score (mean/stddev are
      // themselves dragged by outliers; median/MAD are not). Two
      // grouped interpolated medians (cross-engine-identical per
      // q13c), stats broadcast back, scan-speed flagging. The 1.4826
      // factor normalizes MAD to σ under normality; the comparison is
      // written with the identical literal product on both engines so
      // the boundary is bit-deterministic. Boundary stability: measured
      // min distance of any |value - med| to the cut is 8.5e-1 / 1.3e-1
      // / 4.9e-3 at sf0.001/0.01/0.1 — far above cross-engine
      // interpolated-median noise (~1e-12), so membership cannot flip;
      // asserted >= 1e-6 per scale by BoundaryMarginSpec.
      "q117_mad_outliers",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5D)").as("med"))
        val mad = ev.join(broadcast(med), "event_type")
          .groupBy("event_type")
          .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
        ev.join(broadcast(med), "event_type")
          .join(broadcast(mad), "event_type")
          .filter(abs(col("value") - col("med")) > expr("3.5D * 1.4826D * mad"))
          .select(col("event_id"), col("event_type"), col("value"),
            col("med"), col("mad"))
      },
      Some(
        "WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med " +
          "FROM events GROUP BY 1), " +
          "a AS (SELECT event_type, quantile_cont(ABS(value - med), 0.5) AS mad " +
          "FROM events JOIN m USING (event_type) GROUP BY 1) " +
          "SELECT event_id, event_type, value, med, mad " +
          "FROM events JOIN m USING (event_type) JOIN a USING (event_type) " +
          "WHERE ABS(value - med) > 3.5 * 1.4826 * mad"),
    ),
    QuerySpec(
      // Pareto / ABC analysis: the customers that cover the first 80%
      // of revenue, by exact-decimal cumulative share. The global
      // cumulative window runs over the CUSTOMER AGGREGATE (dimension-
      // sized — same argument as k-means centroids), never the order
      // facts; the 80% cut compares decimals scaled by integers
      // (cum·5 ≤ tot·4), exact on both engines, so no float boundary
      // can flip a row. Share is converted to double only for output.
      "q118_pareto_customers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("rev"))
        val t = c.agg(sum(col("rev")).as("tot"))
        val w = Window.orderBy(col("rev").desc, col("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // zero-total guard (r17 division sweep, the q102 zero-revenue
        // class): share of a 0.00 total is undefined — NULL, as DuckDB
        // already yields. (An EMPTY orders table folds tot to NULL,
        // which was always safe.)
        c.withColumn("cum", sum(col("rev")).over(w))
          .crossJoin(broadcast(t))
          .filter(col("cum") * 5 <= col("tot") * 4)
          .select(col("o_custkey"),
            col("rev").cast("double").as("revenue"),
            when(col("tot") =!= 0,
              col("cum").cast("double") / col("tot").cast("double")).as("cum_share"))
      },
      Some(
        "WITH c AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev " +
          "FROM orders GROUP BY 1), " +
          "t AS (SELECT SUM(rev) AS tot FROM c), " +
          "r AS (SELECT o_custkey, rev, SUM(rev) OVER (ORDER BY rev DESC, o_custkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c) " +
          "SELECT o_custkey, CAST(rev AS DOUBLE) AS revenue, " +
          "CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share " +
          "FROM r CROSS JOIN t WHERE cum * 5 <= tot * 4"),
    ),
    QuerySpec(
      // Per-session feature extraction: q36's 30-minute-gap
      // sessionization extended to the feature row a user-model trains
      // on — duration (µs-exact), event volume, type diversity,
      // purchase conversion, value total. Same single user-partitioned
      // shuffle as q36; every feature is a combinable aggregate of the
      // sessionized frame.
      "q119_session_features",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn(
            "new_sess",
            when(
              col("prev_ts").isNull ||
                col("ts").cast("long") - col("prev_ts").cast("long") > 1800,
              1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(byUser))
          .groupBy("user_id", "session_id")
          .agg(
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .as("duration_us"),
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            round(sum(col("value")), 6).as("value_sum"))
          .withColumn("converted", col("n_purchases") > 0)
      },
      Some(
        "WITH l AS (SELECT user_id, event_id, ts, event_type, value, " +
          "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
          "m AS (SELECT *, CASE WHEN prev_ts IS NULL " +
          "OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_sess FROM l), " +
          "sess AS (SELECT *, SUM(new_sess) OVER " +
          "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM m) " +
          "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, " +
          "epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us, " +
          "COUNT(*) AS n_events, " +
          "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types, " +
          "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_purchases, " +
          "round(SUM(value), 6) AS value_sum, " +
          "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0 AS converted " +
          "FROM sess GROUP BY 1, 2"),
    ),
    QuerySpec(
      // Nested percent-of-total contribution: each (nation, year)
      // cell's share of its nation and of the grand total — the
      // standard drill-down report. Both denominators are exact
      // DECIMAL window sums over the ~175-row aggregate (dims
      // broadcast into the fact scan; one combinable groupBy); shares
      // become doubles only at output, so the same exact quotient is
      // computed on both engines.
      "q121_share_of_total",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val m = Tables(s, dir, "orders")
          .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast("bigint").as("yr"))
          .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("rev"))
        val byNation = Window.partitionBy("n_name")
        val all = Window.partitionBy()
        // zero-total guards (r17 division sweep, the q102 zero-revenue
        // class): a nation (or corpus) whose revenue sums to exactly
        // 0.00 has no defined shares — NULL, as DuckDB already yields
        val natTot = sum(col("rev")).over(byNation)
        val allTot = sum(col("rev")).over(all)
        m.select(
          col("n_name"), col("yr"),
          col("rev").cast("double").as("revenue"),
          when(natTot =!= 0, col("rev").cast("double") / natTot.cast("double"))
            .as("share_of_nation"),
          when(allTot =!= 0, col("rev").cast("double") / allTot.cast("double"))
            .as("share_of_total"))
      },
      Some(
        "WITH m AS (SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, " +
          "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2) " +
          "SELECT n_name, yr, CAST(rev AS DOUBLE) AS revenue, " +
          "CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY n_name) AS DOUBLE) " +
          "AS share_of_nation, " +
          "CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS share_of_total " +
          "FROM m"),
    ),
    QuerySpec(
      // EWMA smoothing (α = 0.25, 16-lag truncation) — the trend line
      // every metrics pipeline draws. EWMA is inherently recursive
      // (y_i = αx_i + (1−α)y_{i−1}), which doesn't parallelize; the
      // engine shape is the TRUNCATED closed form: y_i ≈
      // Σ_k w_k·x_{i−k} / Σ_k w_k over the last 16 lags (the dropped
      // tail weighs (1−α)^16 ≈ 1%), computed as ONE per-user window
      // pass over 16 LAG columns — no self-join, no state, and the
      // partial-window head normalizes by the weights actually
      // present. Weights (3/4)^k are binary-exact doubles emitted as
      // exact decimal literals, and both engines fold the identical
      // left-associated expression tree, so the result is
      // bit-identical before the display rounding. Sampled 1-in-50
      // users to bound the verify frame.
      "q185_ewma",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // (3/4)^k by repeated multiplication: every step is exact in
        // binary (3^k < 2^53), so these literals are the true weights
        val w16 = Iterator.iterate(1.0)(_ * 0.75).take(16).toSeq
        val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ev = Tables.events(s, dir)
          .filter(pmod(col("user_id"), lit(50)) === 0)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        val num = w16.zipWithIndex.map { case (w, k) =>
          lit(w) * coalesce(lag(col("value"), k).over(win), lit(0.0))
        }.reduce(_ + _)
        val den = w16.zipWithIndex.map { case (w, k) =>
          lit(w) * when(lag(col("value"), k).over(win).isNotNull, 1.0).otherwise(0.0)
        }.reduce(_ + _)
        // den = 0.0 exactly when the current row's value is NULL and no
        // non-null lag is in reach — the shared ewmaDiv declares the
        // no-support row as ewma NULL
        ev.withColumn("ewma", ewmaDiv(num, den))
          .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("ewma"))
      },
      Some {
        val w16 = Iterator.iterate(java.math.BigDecimal.ONE)(
          _.multiply(new java.math.BigDecimal("0.75"))).take(16).toSeq
        val over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        val num = w16.zipWithIndex.map { case (w, k) =>
          s"${w.toPlainString} * COALESCE(LAG(value, $k) $over, 0.0)"
        }.mkString(" + ")
        val den = w16.zipWithIndex.map { case (w, k) =>
          s"${w.toPlainString} * (CASE WHEN LAG(value, $k) $over IS NOT NULL THEN 1.0 ELSE 0.0 END)"
        }.mkString(" + ")
        "SELECT user_id, event_id, ts, value, " +
          s"round(($num) / ($den), 6) AS ewma " +
          "FROM events WHERE user_id % 50 = 0"
      },
    ),
  )
}

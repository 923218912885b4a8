package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-management join helpers for the 100 TB design point.
  *
  * AQE's skew-join splitting handles most skew at runtime; these exist
  * for the cases it can't: a broadcast-too-big dimension with a few
  * pathological hot keys (saltedJoin), and repeated fact-fact joins on
  * the same key where paying one bucketed write amortizes every future
  * shuffle away (co-located bucketed joins, see BucketingSpec for the
  * no-Exchange plan proof).
  */
object ScaleJoins {

  /** Equi-join `big ⋈ small` on `key` with the hot-key shuffle skew
    * broken by salting: every big-side row gets a deterministic salt in
    * [0, salts), the small side is replicated `salts`× — the shuffle
    * key becomes (key, salt), spreading a hot key over `salts`
    * partitions. Result is exactly the plain inner join.
    *
    * Salt derives from a hash of big-side columns (not rand()):
    * deterministic across retries/replays — a task retry at 100 TB must
    * not reshuffle rows to different salts. `saltCols` should name a
    * row-identity subset (a natural key); it must vary WITHIN a hot
    * join key or the salt can't spread it. Defaults to every column,
    * which is always correct but defeats column pruning — the scan
    * then reads the full schema just to compute the salt.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltCols: Seq[String] = Nil,
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltSrc = if (saltCols.nonEmpty) saltCols else big.columns.toSeq
    val saltCol: Column =
      pmod(xxhash64(saltSrc.map(col).toIndexedSeq: _*), lit(salts))
    val saltedBig = big.withColumn("__graft_salt", saltCol)
    val saltedSmall = small
      .withColumn("__graft_salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
    saltedBig
      .join(saltedSmall, Seq(key, "__graft_salt"))
      .drop("__graft_salt")
  }

  /** Measured hottest-key load of `key` in `df`: (top-key count, total
    * count). This is q120's skew report reduced to the one statistic
    * salting needs — one combinable groupBy plus a two-long driver
    * read, so the measurement itself is safe at any scale.
    */
  def topKeyShare(df: DataFrame, key: String): (Long, Long) = {
    val row = df.groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("top"), sum(col("n")).as("total"))
      .head()
    // an empty frame aggregates to (NULL, NULL) — read it as (0, 0) so
    // derivedSalts' named `require` fires instead of an opaque
    // NullPointerException at getLong (r16 review: the loud path was
    // designed but unreachable)
    if (row.isNullAt(0)) (0L, 0L) else (row.getLong(0), row.getLong(1))
  }

  /** Salt factor derived from the measured top-key share: enough splits
    * that the hottest key's heaviest salted shard carries about one
    * average partition's rows — `ceil(share × parallelism)`, clamped to
    * [1, parallelism]. A share at or below 1/parallelism derives 1 (the
    * hot key already fits an average partition; salting would only add
    * small-side replication cost).
    */
  def derivedSalts(top: Long, total: Long, parallelism: Int): Int = {
    require(total > 0 && parallelism > 0, "empty frame / bad parallelism")
    val share = top.toDouble / total.toDouble
    math.max(1, math.min(parallelism, math.ceil(share * parallelism).toInt))
  }

  /** The closed measure→mitigate loop: read the top-key share the q120
    * skew report surfaces, derive the salt factor from it, and engage
    * [[saltedJoin]] only when the measurement says the key is actually
    * hot. Result is exactly the plain inner join either way.
    */
  def adaptiveSaltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      parallelism: Int,
      saltCols: Seq[String] = Nil,
  ): DataFrame = {
    val (top, total) = topKeyShare(big, key)
    val salts = derivedSalts(top, total, parallelism)
    if (salts <= 1) big.join(small, Seq(key))
    else saltedJoin(big, small, key, salts, saltCols)
  }

  /** q54's bucketed-table location (per-process, removed on exit). */
  private[operators] lazy val bucketedDir: String = Relational.roundtripDir("bkt_join")

  /** Write `df` as a bucketed external table (8 buckets on `key`,
    * bucket-sorted) and return it re-read through the catalog, which is
    * what carries the bucket spec into the join planner. Overwrite mode:
    * repeated calls in one JVM (bench warmup + 2 timed passes) reuse
    * the table. Both the catalog NAME and the path are keyed by the
    * input dataset — catalog entries are process-global, so
    * interleaved runs over different sf dirs would otherwise
    * overwrite each other's bucket files between write and join.
    */
  private def bucketed(s: org.apache.spark.sql.SparkSession,
      df: DataFrame, key: String, table: String, dir: String): DataFrame = {
    val t = s"${table}_${Relational.datasetKey(dir)}"
    df.write.mode("overwrite")
      .bucketBy(8, key).sortBy(key)
      .option("path", s"${Relational.scoped(bucketedDir, dir)}/$table")
      .saveAsTable(t)
    s.table(t)
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      // the salted fact⋈dim join, oracle-gated: the result must be
      // EXACTLY the plain inner join (salting only re-keys the
      // shuffle); ScaleJoinsSpec separately proves the skew-spreading
      // plan shape on an adversarial 90%-hot-key input
      "q43_salted_join",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val supp = Tables(s, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
        // salt from the row's natural key so the lineitem scan prunes
        // to the 4 columns actually used (ReadSchema checked in
        // ScaleJoinsSpec) instead of hashing all 16
        saltedJoin(li, supp, "l_suppkey", 4,
            saltCols = Seq("l_orderkey", "l_linenumber"))
          .groupBy("s_name")
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"))
      },
      Some(
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items, " +
          "SUM(l_quantity) AS sum_qty " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY s_name"),
    ),
    QuerySpec(
      // The co-located bucketed join, oracle-gated end to end: both
      // sides written as 8-bucket tables on the join key, joined
      // through the catalog (which is what hands the bucket spec to
      // the planner), result must EQUAL the plain join — bucketing
      // only pre-positions data. ScaleJoinsSpec separately proves the
      // plan has no Exchange on either join input. This is the
      // pay-one-write-amortize-every-join layout for repeated
      // fact-fact joins at 100 TB.
      "q54_bucketed_join",
      (s, dir) => {
        val orders = bucketed(s,
          Tables(s, dir, "orders").select("o_custkey", "o_totalprice"),
          "o_custkey", "graft_bkt_orders", dir)
        val cust = bucketed(s,
          Tables(s, dir, "customer").select("c_custkey", "c_mktsegment"),
          "c_custkey", "graft_bkt_customer", dir)
        orders
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_orders"),
            expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
              .as("sum_total"))
      },
      Some(
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_mktsegment"),
    ),
    QuerySpec(
      // Join-key skew report: the top-10 heaviest keys of each lineitem
      // join column — the diagnostic run BEFORE deciding to salt
      // (saltedJoin above) or let AQE split. Each column is one
      // combinable groupBy; the per-column top-10 is a window rank with
      // a deterministic (count DESC, key) tie-break. On the fixture it
      // shows the real story: l_suppkey carries ~40× the per-key load
      // of l_orderkey — exactly the key you'd salt.
      "q120_skew_report",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables(s, dir, "lineitem")
        def keyed(c: String): DataFrame =
          li.groupBy(col(c).cast("string").as("key"))
            .agg(count(lit(1)).as("n"))
            .select(lit(c).as("col"), col("key"), col("n"))
        val u = keyed("l_suppkey")
          .unionAll(keyed("l_partkey"))
          .unionAll(keyed("l_orderkey"))
        val w = Window.partitionBy("col").orderBy(col("n").desc, col("key"))
        u.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      },
      Some(
        "WITH u AS (SELECT 'l_suppkey' AS col, CAST(l_suppkey AS VARCHAR) AS key, " +
          "COUNT(*) AS n FROM lineitem GROUP BY 2 " +
          "UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR), COUNT(*) " +
          "FROM lineitem GROUP BY 2 " +
          "UNION ALL SELECT 'l_orderkey', CAST(l_orderkey AS VARCHAR), COUNT(*) " +
          "FROM lineitem GROUP BY 2), " +
          "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY col ORDER BY n DESC, key) " +
          "AS rk FROM u) SELECT col, key, n, rk FROM r WHERE rk <= 10"),
    ),
    QuerySpec(
      // q120's report CLOSED into q43's mitigation: build a join key
      // that is deliberately Zipf-hot (~70% of lineitem rows collapse
      // onto supplier 1), MEASURE its top-key share with the same
      // combinable agg the skew report uses, DERIVE the salt factor
      // from that share (ceil(share × shuffle.partitions)), and join
      // salted. The oracle is the plain join — salting must be
      // invisible in the result; ScaleJoinsSpec proves the derived
      // factor and that the salted plan actually engaged on the hot
      // key the measurement named.
      "q122_adaptive_salted_join",
      (s, dir) => {
        val parallelism = s.conf.get("spark.sql.shuffle.partitions").toInt
        val big = Tables(s, dir, "lineitem")
          .select(
            when(pmod(col("l_orderkey"), lit(10)) < 7, lit(1L))
              .otherwise(col("l_suppkey")).as("sk"),
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val small = Tables(s, dir, "supplier")
          .select(col("s_suppkey").as("sk"), col("s_name"))
        adaptiveSaltedJoin(big, small, "sk", parallelism,
            saltCols = Seq("l_orderkey", "l_linenumber"))
          .groupBy("s_name")
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"))
      },
      Some(
        "WITH b AS (SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1 " +
          "ELSE l_suppkey END AS sk, l_quantity FROM lineitem) " +
          "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items, " +
          "SUM(l_quantity) AS sum_qty " +
          "FROM b JOIN supplier ON sk = s_suppkey GROUP BY s_name"),
    ),
    QuerySpec(
      // Z-order (Morton) clustering key — the data-layout move behind
      // Delta/Iceberg OPTIMIZE ZORDER: interleaving the bits of two
      // quantized dimensions gives ONE sort key under which any
      // contiguous key range touches a bounded rectangle of BOTH
      // dimensions, so min/max file statistics prune scans on either
      // predicate. The gated output is the locality contract itself:
      // per 64-wide z-range, the spanned (x, y) rectangle — bounded
      // spans are what make multi-dim pruning work. All-integer bit
      // arithmetic (shift/and/add), bit-identical cross-engine; the
      // interleave is a zero-shuffle narrow expression at any scale.
      "q182_zorder_locality",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(
            floor(col("l_quantity")).cast("long").as("x"),
            floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("y"))
        li.withColumn("z", expr(zInterleaveSql("x", "y", spark = true)))
          .withColumn("zbucket", expr("shiftright(z, 6)"))
          .groupBy("zbucket")
          .agg(
            count(lit(1)).as("n"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
          .withColumn("x_span", col("max_x") - col("min_x"))
          .withColumn("y_span", col("max_y") - col("min_y"))
      },
      Some(
        "WITH d AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x, " +
          "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y FROM lineitem), " +
          s"z AS (SELECT x, y, ${zInterleaveSql("x", "y", spark = false)} AS z FROM d) " +
          "SELECT z >> 6 AS zbucket, CAST(COUNT(*) AS BIGINT) AS n, " +
          "MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y, " +
          "MAX(x) - MIN(x) AS x_span, MAX(y) - MIN(y) AS y_span " +
          "FROM z GROUP BY 1"),
    ),
    QuerySpec(
      // Compaction planner — the small-file answer at 100 TB: roll the
      // per-source file inventory (metadata-sized, like every real
      // table-format manifest) into target-sized compaction bins by
      // cumulative-sum next-fit: files ordered largest-first within
      // their source, bin = (running total − own size) div target.
      // Deterministic (size-then-id ordering), all-integer, and the
      // only window runs PER SOURCE over the inventory frame — never
      // over data rows; the data move it plans is a file-granular
      // rewrite downstream. Output is the plan summary a compactor
      // would execute: per (source, bin) file count, bytes, fill.
      "q183_compaction_plan",
      (s, dir) => {
        val files = Tables(s, dir, "documents")
          .groupBy(col("source"), expr("doc_id div 50").as("fgrp"))
          .agg(sum(col("n_chars")).as("sz"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("sz").desc, col("fgrp"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        files
          .withColumn("cum", sum(col("sz")).over(w))
          .withColumn("bin", expr("(cum - sz) div 2000"))
          .groupBy("source", "bin")
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("sz")).as("bytes"),
            min(col("sz")).as("min_file"),
            max(col("sz")).as("max_file"))
          .withColumn("fill", round(col("bytes") / lit(2000.0), 4))
      },
      Some(
        "WITH f AS (SELECT source, doc_id // 50 AS fgrp, " +
          "CAST(SUM(n_chars) AS BIGINT) AS sz FROM documents GROUP BY 1, 2), " +
          "c AS (SELECT source, fgrp, sz, " +
          "SUM(sz) OVER (PARTITION BY source ORDER BY sz DESC, fgrp " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM f) " +
          "SELECT source, CAST((cum - sz) // 2000 AS BIGINT) AS bin, " +
          "CAST(COUNT(*) AS BIGINT) AS n_files, CAST(SUM(sz) AS BIGINT) AS bytes, " +
          "MIN(sz) AS min_file, MAX(sz) AS max_file, " +
          "round(SUM(sz) / 2000.0, 4) AS fill " +
          "FROM c GROUP BY 1, 2"),
    ),
  )

  /** Morton bit-interleave of the low 6 bits of `x` and `y`, emitted in
    * the target dialect (Spark uses shiftleft/shiftright functions,
    * DuckDB the << / >> operators; `&` parses in both). Pure integer
    * arithmetic — bit-identical across engines by construction.
    */
  private def zInterleaveSql(x: String, y: String, spark: Boolean): String = {
    def shr(e: String, k: Int) = if (spark) s"shiftright($e, $k)" else s"($e >> $k)"
    def shl(e: String, k: Int) = if (spark) s"shiftleft($e, $k)" else s"($e << $k)"
    (0 until 6).map { k =>
      s"${shl(s"(${shr(x, k)} & 1)", 2 * k)} + ${shl(s"(${shr(y, k)} & 1)", 2 * k + 1)}"
    }.mkString("(", " + ", ")")
  }
}

package graft.operators

import graft.{GraftSession, SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Degenerate-input contracts from the r16 ANSI-division sweep.
  *
  * The engine's sessions run Spark 4's ANSI default (pinned by the
  * first test), under which division by an exact-0.0 divisor THROWS —
  * even for DOUBLE operands — while the DuckDB oracle's x/0 is NULL.
  * Any query whose denominator can reach 0.0 on degenerate-but-
  * realistic data therefore crashes the Spark side only, unless the
  * degenerate case is declared. These tests drive each such query over
  * the exact fixture that reaches its zero divisor and assert the
  * oracle's NULL semantics; every test was RED against the unguarded
  * pre-fix shape (the query died with DIVIDE_BY_ZERO). The guarded
  * queries (q89's mx > 0, q145's sd > 1e-9, q170's n_pred > 0,
  * q173's greatest(cnt-1, 1)) already followed this convention — the
  * sweep extends it to the sites that missed it.
  */
class AnsiDivisionSpec extends SparkSpec {

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
  private val ts1 = java.sql.Timestamp.valueOf("2024-01-05 11:00:00")

  test("session mode pin: ANSI on, DOUBLE division by zero throws") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "the session no longer runs ANSI — re-adjudicate the r16 division-guard convention")
    assert(scala.util.Try(spark.sql("SELECT 1.0D / 0.0D").collect()).isFailure,
      "ANSI DOUBLE division by zero no longer throws — the guards may be retirable")
    // the r17 access/cast siblings: these pins are what make the
    // try_element_at/try_cast fixes (q18/q156) non-optional — if any
    // stops failing, the corresponding try_ wrapper is retirable.
    // Asymmetry verified empirically r17: MAP element_at on a missing
    // key is NULL even under ANSI (only ARRAY index access throws), so
    // q18c needs no wrapper — pinned so a future Spark tightening
    // fails here, not in production.
    assert(scala.util.Try(
      spark.sql("SELECT element_at(map('a', '1'), 'k')").collect()).isSuccess,
      "ANSI element_at on a missing map key now THROWS — q18c needs a try_element_at wrapper")
    assert(scala.util.Try(
      spark.sql("SELECT element_at(array(1, 2), 5)").collect()).isFailure,
      "ANSI element_at past the array bound no longer throws — q156's try_element_at may be retirable")
    assert(scala.util.Try(
      spark.sql("SELECT CAST('abc' AS BIGINT)").collect()).isFailure,
      "ANSI CAST of a non-numeric string no longer throws — q18's try_cast may be retirable")
  }

  private def withEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, java.lang.Double)])(
      body: String => Unit): Unit = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_div_events")
    try {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      body(dir.toString)
    } finally GraftSession.rmTree(dir.toFile)
  }

  private def withDocs(rows: Seq[(Long, String, String, String, Long)])(
      body: String => Unit): Unit = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_div_docs")
    try {
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      body(dir.toString)
    } finally GraftSession.rmTree(dir.toFile)
  }

  test("q157 twap: a day whose events share one microsecond yields twap NULL, not DIVIDE_BY_ZERO") {
    // two same-µs events: the first gets dur = 0 (non-NULL!), the
    // second dur = NULL (last of day) → sum(dur) = 0.0 exactly
    withEvents(Seq(
      (1L, ts0, 7L, "click", 1.5),
      (2L, ts0, 7L, "click", 2.5),
      (3L, ts0, 8L, "view", 1.0), (4L, ts1, 8L, "view", 3.0))) { dir =>
      val out = SparkEntry.queries("q157_twap")(spark, dir)
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      assert(out(7L).isEmpty, "zero-support day must be twap NULL")
      assert(out(8L).nonEmpty, "a real-duration day still averages")
    }
  }

  test("q103 z-score: a zero-variance group is outlier-free, not DIVIDE_BY_ZERO") {
    // ≥2 identical values → stddev_samp = 0.0 exactly (not NULL)
    withEvents(Seq(
      (1L, ts0, 1L, "error", 42.0),
      (2L, ts1, 2L, "error", 42.0),
      (3L, ts0, 3L, "error", 42.0))) { dir =>
      val out = SparkEntry.queries("q103_zscore_outliers")(spark, dir).collect()
      assert(out.isEmpty, s"no variance → no outliers, got ${out.length} rows")
    }
  }

  test("q185 ewma: a NULL-valued head row yields ewma NULL, not DIVIDE_BY_ZERO") {
    // user_id 0 passes the 1-in-50 sample; the first event's value is
    // NULL, so at that row every reachable lag is NULL → den = 0.0
    withEvents(Seq(
      (1L, ts0, 0L, "click", null),
      (2L, ts1, 0L, "click", 2.0))) { dir =>
      val out = SparkEntry.queries("q185_ewma")(spark, dir)
        .orderBy("event_id")
        .collect().map(r => Option(r.get(4)))
      assert(out.head.isEmpty, "no-support row must be ewma NULL")
      assert(out(1).nonEmpty, "the next row has support (its own value)")
    }
  }

  test("q200 curation funnel: an empty-text doc grades q_ok = false, not DIVIDE_BY_ZERO") {
    withDocs(Seq(
      (1L, "", "en", "src1", 0L),
      (2L, ("the quick brown fox " * 5).trim, "en", "src1", 99L))) { dir =>
      val out = SparkEntry.queries("q200_curation_funnel")(spark, dir)
        .collect().map(r => (r.getLong(1), r.getLong(2))).head // (n_in, n_quality)
      assert(out._1 == 2L, s"both docs counted in: $out")
      assert(out._2 <= 1L, s"the empty doc must not pass quality: $out")
    }
  }

  test("q163 weighted sample: an n_chars = 0 doc ranks last with a NULL key, not DIVIDE_BY_ZERO") {
    withDocs(Seq(
      (1L, "", "en", "src1", 0L),
      (2L, "alpha beta", "en", "src1", 10L))) { dir =>
      val out = SparkEntry.queries("q163_weighted_sample")(spark, dir)
        .collect().map(r => (r.getLong(0), Option(r.get(2))))
      assert(out.head._1 == 2L && out.head._2.nonEmpty,
        s"the weighted doc must lead: ${out.toSeq}")
      assert(out.last._1 == 1L && out.last._2.isEmpty,
        s"the zero-weight doc must trail with a NULL key: ${out.toSeq}")
    }
  }

  test("q179 Mann-Whitney: a one-sided sample yields z NULL, not DIVIDE_BY_ZERO") {
    // clicks only, no purchases: n_b = 0 → sigma2 = 0.0 exactly → the
    // pre-fix z divided by sqrt(0.0); (a single-row slice additionally
    // zeroes the nn·(nn−1) tie divisor — covered by the nn > 1 guard)
    withEvents(Seq(
      (1L, ts0, 1L, "click", 1.0),
      (2L, ts0, 2L, "click", 2.0),
      (3L, ts1, 3L, "click", 3.0))) { dir =>
      val Seq(row) = SparkEntry.queries("q179_mann_whitney")(spark, dir)
        .collect().toSeq
      assert(row.getLong(0) == 3L && row.getLong(1) == 0L)
      assert(Option(row.get(3)).isEmpty, "one-sided sample must report z NULL")
    }
  }

  test("q194 drift monitor: a constant-valued reference half yields shift NULL, not DIVIDE_BY_ZERO") {
    val d05 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val d20 = java.sql.Timestamp.valueOf("2024-01-20 10:00:00")
    withEvents(Seq(
      (1L, d05, 1L, "click", 5.0), (2L, d05, 2L, "click", 5.0), // ref: sd = 0.0
      (3L, d20, 3L, "click", 2.0), (4L, d20, 4L, "click", 3.0))) { dir =>
      val Seq(row) = SparkEntry.queries("q194_drift_monitor")(spark, dir)
        .collect().toSeq
      assert(row.getLong(1) == 2L && row.getLong(2) == 2L)
      assert(Option(row.get(4)).isEmpty,
        "zero-variance reference must report mean_shift_sd NULL")
    }
  }

  // ------------------------------------------------------------------
  // r17 division sweep (found by DivisionConventionSpec's plan walk —
  // the mechanized r16 convention): each test drives the query over the
  // exact fixture that reaches its zero divisor; each was RED against
  // the unguarded pre-fix shape (DIVIDE_BY_ZERO).
  // ------------------------------------------------------------------

  test("q176 pca: a single-vector corpus (cov exactly 0) yields NULL loadings, not DIVIDE_BY_ZERO") {
    // n = 1 makes cov = E[xx] − μμ cancel BIT-EXACTLY (single-term
    // sums, /1): the first power-iterate norm is exactly 0.0 — the
    // pre-fix normalize divided by it. A tiny shard or an all-identical
    // corpus is a realistic degenerate.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_div_pca")
    try {
      Seq((0L, Seq(0.5f, 0.25f, 0.5f, 0.25f), 1))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = SparkEntry.queries("q176_pca_power")(spark, dir.toString)
        .collect().map(r => Option(r.get(1)))
      assert(out.length == 4 && out.forall(_.isEmpty),
        s"rank-0 direction must report NULL loadings: ${out.toSeq}")
    } finally GraftSession.rmTree(dir.toFile)
  }

  test("q168 welch: constant-valued arms (zero SE) yield t NULL, not DIVIDE_BY_ZERO") {
    // 'error': both arms constant (v_a = v_b = 0.0 exactly, 2 rows
    // each) → SE exactly 0.0; 'view' is the live control.
    withEvents(Seq(
      (1L, ts0, 0L, "error", 7.0), (2L, ts0, 2L, "error", 7.0),
      (3L, ts0, 1L, "error", 7.0), (4L, ts0, 3L, "error", 7.0),
      (5L, ts0, 0L, "view", 1.0), (6L, ts0, 2L, "view", 3.0),
      (7L, ts0, 1L, "view", 2.0), (8L, ts1, 3L, "view", 5.0))) { dir =>
      val out = SparkEntry.queries("q168_ab_test")(spark, dir)
        .collect().map(r => r.getString(0) -> Option(r.get(5))).toMap
      assert(out("error").isEmpty, "zero-SE experiment must report t NULL")
      assert(out("view").nonEmpty, "a live experiment still tests")
    }
  }

  test("q102/q118/q121 revenue shares: an all-zero-revenue ledger yields NULL ratios, not DIVIDE_BY_ZERO") {
    // Zero-priced orders (free/promo ledger) are realistic; the three
    // share/growth queries divided by the 0.00 total/base. DuckDB's
    // x/0 is NULL on all three — the guards pin Spark to the same.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_div_rev")
    try {
      val jan = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
      val feb = java.sql.Timestamp.valueOf("2024-02-10 00:00:00")
      Seq((1L, 1L, "O", 0.0, jan, "1-URGENT"), (2L, 1L, "O", 0.0, feb, "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Seq((1L, "c1", 0, 0.0, "BUILDING"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      Seq((0, "NATION_0", 0))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      val mom = SparkEntry.queries("q102_mom_growth")(spark, dir.toString)
        .orderBy("month").collect().map(r => Option(r.get(3)))
      assert(mom.length == 2 && mom.forall(_.isEmpty),
        s"growth off a zero base must be NULL: ${mom.toSeq}")
      val pareto = SparkEntry.queries("q118_pareto_customers")(spark, dir.toString)
        .collect().map(r => Option(r.get(2)))
      assert(pareto.nonEmpty && pareto.forall(_.isEmpty),
        s"share of a zero total must be NULL: ${pareto.toSeq}")
      val share = SparkEntry.queries("q121_share_of_total")(spark, dir.toString)
        .collect().flatMap(r => Seq(Option(r.get(3)), Option(r.get(4))))
      assert(share.nonEmpty && share.forall(_.isEmpty),
        s"shares of a zero total must be NULL: ${share.toSeq}")
    } finally GraftSession.rmTree(dir.toFile)
  }

  test("q83 supplycost: a zero-quantity line is skipped by the NULL-skipping MIN, not DIVIDE_BY_ZERO") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_div_q2")
    try {
      Seq((1L, "part one", "B1", "LARGE", 15, 10.0))
        .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      Seq((1L, "s1", 0, 5.0))
        .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
      Seq((0, "NATION_0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      Seq((0, "EUROPE")).toDF("r_regionkey", "r_name")
        .write.mode("overwrite").parquet(s"$dir/region.parquet")
      // line 1: cancelled/free (quantity 0 — the pre-fix divisor);
      // line 2: the real price-per-unit sample (10.0 / 2 = 5)
      Seq((1L, 1L, 1L, 0.0, 7.0), (2L, 1L, 1L, 2.0, 10.0))
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val rows = SparkEntry.queries("q83_tpch_q2")(spark, dir.toString).collect()
      assert(rows.length == 1 && rows.head.getLong(3) == 1L,
        s"the zero-quantity line must not crash or win the MIN: ${rows.toSeq}")
    } finally GraftSession.rmTree(dir.toFile)
  }

  // ------------------------------------------------------------------
  // r17 ANSI access/cast sweep — the sibling class of the division
  // contract: under the ANSI session default, element_at on an
  // out-of-bounds ARRAY index THROWS and CAST of a non-numeric string
  // THROWS, where the DuckDB oracle yields NULL on both (MAP
  // element_at is already NULL — pinned in the mode test above). Same
  // oracle-blindness: the fixtures carry homogeneous JSON and
  // fixed-dim embeddings, so the gate never sees the class.
  // ------------------------------------------------------------------

  test("q18/q18c json access: props without 'k' or with non-numeric k yields NULL, not an ANSI error") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_access_json")
    try {
      Seq(
        (1L, ts0, 1L, "click", 1.0, """{"k":"7","x":"a"}"""),
        (2L, ts0, 2L, "click", 1.0, """{"x":"only"}"""),
        (3L, ts0, 3L, "click", 1.0, """{"k":"abc"}"""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val j = SparkEntry.queries("q18_json")(spark, dir.toString)
        .orderBy("event_id").collect()
      assert(Option(j(0).get(2)).contains(7L), s"numeric k must cast: ${j.toSeq}")
      assert(Option(j(1).get(2)).isEmpty && Option(j(1).get(1)).isEmpty,
        "a payload without k must be NULL (both columns)")
      assert(j(2).getString(1) == "abc" && Option(j(2).get(2)).isEmpty,
        "non-numeric k keeps k_str and NULLs the cast — not CAST_INVALID_INPUT")
      val m = SparkEntry.queries("q18c_map_ops")(spark, dir.toString)
        .orderBy("event_id").collect()
      assert(m(0).getString(3) == "7", s"present key must read: ${m.toSeq}")
      assert(Option(m(1).get(3)).isEmpty,
        "a missing map key must be NULL — not MAP_KEY_DOES_NOT_EXIST")
    } finally GraftSession.rmTree(dir.toFile)
  }

  test("q33f media ingest: a stray png without an id in its name dies LOUDLY, not CAST_INVALID_INPUT (or silent NULL)") {
    // the shared pngDocId expression (used by q33f's binaryFile scan):
    // well-formed names parse; a stray lake file names the query and
    // the path — red pre-fix: an opaque CAST_INVALID_INPUT with
    // neither. Exercised expression-level because q33f materializes
    // (and wipes) its own fixture dir per call.
    val s = spark; import s.implicits._
    val ok = Seq("/lake/img_42.png", "s3://bucket/a/img_7.png").toDF("path")
      .select(MultimodalOps.pngDocId(col("path"), "q33f_binaryfile_ingest").as("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(ok == Seq(42L, 7L), s"well-formed names must parse: $ok")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception] {
      Seq("/lake/cover.png").toDF("path")
        .select(MultimodalOps.pngDocId(col("path"), "q33f_binaryfile_ingest"))
        .collect()
    }
    assert(messages(e).exists(m => m.contains("q33f_binaryfile_ingest") && m.contains("cover.png")),
      s"the guard must name the query and the file: ${messages(e).mkString(" | ").take(300)}")
  }

  test("q156 embedding stats: a ragged (short) embedding contributes NULL cells, not INVALID_ARRAY_INDEX") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_access_emb")
    try {
      // vec 0 is the truncated write (2 of 4 dims); 1–2 are intact
      Seq(
        (0L, Seq(0.5f, 0.25f), 1),
        (1L, Seq(0.5f, 0.25f, 0.75f, 1.0f), 1),
        (2L, Seq(0.25f, 0.5f, 0.25f, 0.5f), 1))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val Seq(row) = SparkEntry.queries("q156_embedding_stats")(spark, dir.toString)
        .collect().toSeq
      assert(row.getLong(1) == 3L, "all three vectors count")
      // mean_2 (index 4): dims 3/4 exist only on the intact rows —
      // averaged over those two, the ragged row's NULL cell skipped
      assert(row.getDouble(4) == 0.5, s"mean_2 must average the intact rows: $row")
    } finally GraftSession.rmTree(dir.toFile)
  }

  test("q209 gate row: every degenerate key is NULL, every control key is real (r17)") {
    // q209 is the CORRECTNESS-visible twin of this suite (VERDICT r16
    // #2): it routes each degenerate class through the SAME shared
    // guard expression the production queries use, on both engines.
    // This spec-side pin catches a guard regression inside `sbt test`
    // alone; the driver's oracle row catches it cross-engine.
    val rows = SparkEntry.queries("q209_degenerate_probes")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    val degenerate = Seq(
      ("cosine", 2L), ("twap", 1L), ("zscore", 1L), ("ewma_div", 1L),
      ("mean_shift", 1L), ("mw_z", 1L), ("mw_z", 3L), ("es_key", 1L), ("digit_ratio", 1L),
      ("try_cast", 1L), ("array_read", 1L))
    val control = Seq(
      ("cosine", 1L), ("twap", 2L), ("zscore", 2L), ("ewma_div", 2L),
      ("mean_shift", 2L), ("mw_z", 2L), ("es_key", 2L), ("digit_ratio", 2L),
      ("try_cast", 2L), ("array_read", 2L))
    // the r18 mw_rank pair belongs to the NULL-ORDERING class, whose
    // failure mode is a SHIFTED VALUE, not a throw: its degenerate key
    // (a NULL measurement in the sample) yields the rank sum of the
    // FILTERED population — a real number the oracle hash pins.
    // NewOpsPropertySpec pins both values and the regression shift.
    val valuePinned = Seq(
      ("mw_rank", 1L) -> 2.0, ("mw_rank", 2L) -> 6.0)
    assert(rows.keySet == (degenerate ++ control ++ valuePinned.map(_._1)).toSet,
      s"probe surface drifted: ${rows.keySet}")
    degenerate.foreach(k => assert(rows(k).isEmpty, s"$k must be NULL (guard regressed?)"))
    control.foreach(k => assert(rows(k).nonEmpty, s"$k must be real (over-guarded?)"))
    valuePinned.foreach { case (k, v) =>
      assert(rows(k).contains(v), s"$k must be the filtered-population rank sum $v: ${rows(k)}")
    }
  }

  test("q30/q32 cosine: a zero vector gets a NULL cosine (ranked last / filtered), not DIVIDE_BY_ZERO") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ansi_div_emb")
    try {
      def vec(x: Float): Seq[Float] = Seq.fill(64)(x)
      // qid 0 is a live query; vec_id 10 is the zero vector (failed
      // embed); 11–12 are normal candidates sharing label 1
      Seq(
        (0L, vec(0.5f), 1),
        (10L, vec(0.0f), 1),
        (11L, vec(0.4f), 1),
        (12L, vec(0.6f), 1))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // explicit rank order: the positional takeWhile/last assertions
      // below must not lean on the window sort's incidental output
      // order (r16 ADVICE)
      val topk = SparkEntry.queries("q30_cosine_topk")(spark, dir.toString)
        .filter(col("qid") === 0L)
        .orderBy(col("rk"))
        .collect().map(r => (r.getLong(1), Option(r.get(2))))
      assert(topk.nonEmpty, "query must run over the degenerate corpus")
      assert(topk.takeWhile(_._2.nonEmpty).map(_._1).toSet == Set(11L, 12L),
        s"real candidates rank first: ${topk.toSeq}")
      assert(topk.last == ((10L, None)),
        s"the zero vector ranks last with NULL cosine: ${topk.toSeq}")
      // the thresholded pair query simply drops the zero vector (NULL
      // >= 0.3 is not true on either engine)
      val pairs = SparkEntry.queries("q32_cosine_pairs")(spark, dir.toString)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(pairs.nonEmpty && !pairs.exists(p => p._1 == 10L || p._2 == 10L),
        s"zero vector must not pair: ${pairs.toSeq}")
    } finally GraftSession.rmTree(dir.toFile)
  }
}

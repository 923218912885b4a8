package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.functions._

/** q209 — the degenerate-input GATE ROW (VERDICT r16 #2), not a new
  * operator: the engine surface remains the 242 operator queries.
  *
  * The r16 ANSI-division sweep guarded 13 crash sites, but the class
  * is structurally invisible to the oracle gate — the fixture corpus
  * carries no zero vector, no empty document, no same-microsecond day,
  * no zero-variance slice, so a guard that regresses to throwing still
  * passes every CORRECTNESS row. This query makes the class
  * GATE-VISIBLE: it drives each degenerate shape through the SAME
  * shared guard expression the production query uses
  * (SimilarityOps.cosine, TemporalOps.twapCol, WindowOps.safeZ /
  * ewmaDiv, StatsOps.mwSigma2 / mwZ / meanShiftSd, CurationOps.esKey /
  * digitRatio — each refactored in r17 so the probe and the query
  * cannot diverge), over inline degenerate rows present on BOTH
  * engines (Spark literal frames / DuckDB VALUES). Every probe carries
  * one degenerate key (v must be NULL — an unguarded division would
  * instead DIE under the session's ANSI default and fail the
  * CORRECTNESS row with err != null) and one control key (v must be
  * the real value — an over-guarded always-NULL expression fails the
  * hash). The mechanical other half of the defense is
  * DivisionConventionSpec, which walks all declared plans for
  * unguarded divisors that never had a probe in the first place.
  *
  * Scale posture: the probe frames are O(1) literals — the query costs
  * nothing at any scale; its value is that the driver's cross-engine
  * gate now exercises the NULL-vs-throw contract every round.
  */
object DegenerateProbes {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q209_degenerate_probes",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        import s.implicits._

        // zero vector (failed embed) → cosine NULL; control ≈ 0.707107
        val cosine = Seq(
          (1L, Seq(0.25f, 0f, 0f, 0f)),
          (2L, Seq(0f, 0f, 0f, 0f)))
          .toDF("k", "a")
          .withColumn("q", typedLit(Seq(0.5f, 0.5f, 0f, 0f)))
          .select(
            lit("cosine").as("probe"), col("k"),
            round(SimilarityOps.cosine(
              expr("float_dot(a, q)"),
              sqrt(expr("float_dot(a, a)")) * sqrt(expr("float_dot(q, q)"))), 6).as("v"))

        // same-microsecond day (sum(dur) = 0.0, non-NULL) → twap NULL
        val twap = Seq(
          (1L, 1.5, Some(0.0)), (1L, 2.5, None),
          (2L, 1.0, Some(60.0)), (2L, 3.0, None))
          .toDF("k", "value", "dur")
          .groupBy("k")
          .agg(TemporalOps.twapCol.as("v"))
          .select(lit("twap").as("probe"), col("k"), col("v"))

        // zero-variance slice (sd = 0.0 exactly) → z NULL
        val zin = Seq((1L, 5.0), (1L, 5.0), (1L, 5.0), (2L, 2.0), (2L, 4.0))
          .toDF("k", "value")
        val zst = zin.groupBy("k")
          .agg(avg("value").as("m"), stddev_samp(col("value")).as("sd"))
        val zscore = zin.join(zst, Seq("k"))
          .groupBy("k")
          .agg(round(max(WindowOps.safeZ(col("value"), col("m"), col("sd"))), 6).as("v"))
          .select(lit("zscore").as("probe"), col("k"), col("v"))

        // NULL-valued head row (den = 0.0) → ewma NULL
        val ewma = Seq((1L, 3.0, 0.0), (2L, 3.0, 2.0))
          .toDF("k", "num", "den")
          .select(lit("ewma_div").as("probe"), col("k"),
            WindowOps.ewmaDiv(col("num"), col("den")).as("v"))

        // zero-variance reference half (sd_ref = 0.0) → shift NULL
        val shift = Seq((1L, 3.0, 2.0, 0.0), (2L, 3.0, 2.0, 0.5))
          .toDF("k", "m_live", "m_ref", "sd_ref")
          .select(lit("mean_shift").as("probe"), col("k"),
            StatsOps.meanShiftSd(col("m_live"), col("m_ref"), col("sd_ref")).as("v"))

        // one-sided sample (sigma2 = 0.0) and single-row slice
        // (nn·(nn−1) = 0 → sigma2 NULL) → z NULL; two-sided control
        val mw = Seq(
          (1L, 0.0, 3L, 0L, 0L),
          (2L, 3.0, 2L, 2L, 0L),
          (3L, 0.0, 1L, 0L, 0L))
          .toDF("k", "u_stat", "n_a", "n_b", "ties")
          .withColumn("sigma2",
            StatsOps.mwSigma2(col("n_a"), col("n_b"), col("n_a") + col("n_b"), col("ties")))
          .select(lit("mw_z").as("probe"), col("k"),
            StatsOps.mwZ(col("u_stat"), col("n_a"), col("n_b"), col("sigma2")).as("v"))

        // zero-weight doc (n_chars = 0 → 1/0) → A-ES key NULL
        val esk = Seq((1L, 0.25, 0L), (2L, 0.25, 2L))
          .toDF("k", "u", "n_chars")
          .select(lit("es_key").as("probe"), col("k"),
            round(CurationOps.esKey(col("u"), col("n_chars")), 9).as("v"))

        // empty document (length 0 divisor) → digit_ratio NULL
        val ratio = Seq((1L, ""), (2L, "a1b2"))
          .toDF("k", "text")
          .select(lit("digit_ratio").as("probe"), col("k"),
            round(CurationOps.digitRatio, 6).as("v"))

        // NULL-ordering probe (VERDICT r17 #3, the THIRD oracle-blind
        // class — wrong answers, not crashes): a NULL-valued
        // measurement through q179's shared midrank expression
        // (StatsOps.mwRankedBins) must be EXCLUDED from ranking on
        // both engines. Unlike the division probes, the degenerate key
        // (k=1, one NULL measurement) yields a NON-NULL v — the rank
        // sum over the filtered population; if the population filter
        // regresses, Spark ranks the NULL bin FIRST (DuckDB LAST) and
        // every midrank shifts, failing the hash. k=2 is the NULL-free
        // control.
        val mwr = Seq(
          (1L, Some(1.0), 1L), (1L, None, 1L), (1L, Some(2.0), 0L),
          (2L, Some(1.0), 1L), (2L, Some(2.0), 1L), (2L, Some(3.0), 0L))
          .toDF("k", "value", "is_a")
          .select(col("k"),
            floor(col("value") * lit(10.0)).cast("long").as("v"), col("is_a"))
        val mwRank = StatsOps.mwRankedBins(mwr, Seq("k"))
          .groupBy("k")
          .agg(sum(col("ca").cast("decimal(38,0)") * col("r2")).cast("double").as("v"))
          .select(lit("mw_rank").as("probe"), col("k"), col("v"))

        // r17 access/cast siblings (q18's try_cast, q156's
        // try_element_at): a non-numeric string and an out-of-bounds
        // ARRAY read must be NULL on both engines, where the unguarded
        // ANSI shapes throw CAST_INVALID_INPUT / INVALID_ARRAY_INDEX
        val tcast = Seq((1L, "abc"), (2L, "7"))
          .toDF("k", "sv")
          .select(lit("try_cast").as("probe"), col("k"),
            expr("try_cast(sv AS DOUBLE)").as("v"))
        val aread = Seq((1L, Seq(0.5, 0.25), 5), (2L, Seq(0.5, 0.25), 2))
          .toDF("k", "a", "i")
          .select(lit("array_read").as("probe"), col("k"),
            expr("try_element_at(a, i)").as("v"))

        cosine.unionByName(twap).unionByName(zscore).unionByName(ewma)
          .unionByName(shift).unionByName(mw).unionByName(esk).unionByName(ratio)
          .unionByName(mwRank).unionByName(tcast).unionByName(aread)
          .orderBy("probe", "k")
      },
      Some(
        // the oracle side needs NO guards: DuckDB's x/0 IS NULL — that
        // asymmetry is the entire class this row gates
        "WITH ce AS (SELECT CAST(k AS BIGINT) AS k, CAST(a AS DOUBLE[]) AS a, " +
          "CAST(q AS DOUBLE[]) AS q FROM (VALUES " +
          "(1, [0.25, 0, 0, 0], [0.5, 0.5, 0, 0]), " +
          "(2, [0, 0, 0, 0], [0.5, 0.5, 0, 0])) t(k, a, q)), " +
          "tw AS (SELECT CAST(k AS BIGINT) AS k, CAST(value AS DOUBLE) AS value, " +
          "CAST(dur AS DOUBLE) AS dur FROM (VALUES " +
          "(1, 1.5, 0.0), (1, 2.5, NULL), (2, 1.0, 60.0), (2, 3.0, NULL)) t(k, value, dur)), " +
          "zi AS (SELECT CAST(k AS BIGINT) AS k, CAST(value AS DOUBLE) AS value FROM (VALUES " +
          "(1, 5.0), (1, 5.0), (1, 5.0), (2, 2.0), (2, 4.0)) t(k, value)), " +
          "zs AS (SELECT k, AVG(value) AS m, STDDEV_SAMP(value) AS sd FROM zi GROUP BY k), " +
          "mw AS (SELECT CAST(k AS BIGINT) AS k, CAST(u_stat AS DOUBLE) AS u_stat, " +
          "CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, CAST(ties AS BIGINT) AS ties " +
          "FROM (VALUES (1, 0.0, 3, 0, 0), (2, 3.0, 2, 2, 0), (3, 0.0, 1, 0, 0)) " +
          "t(k, u_stat, n_a, n_b, ties)) " +
          "SELECT 'cosine' AS probe, k, round(" +
          "(SELECT SUM(a[i] * q[i]) FROM unnest(range(1, 5)) AS u(i)) / " +
          "(sqrt((SELECT SUM(a[i] * a[i]) FROM unnest(range(1, 5)) AS u(i))) * " +
          "sqrt((SELECT SUM(q[i] * q[i]) FROM unnest(range(1, 5)) AS u(i)))), 6) AS v FROM ce " +
          "UNION ALL " +
          "SELECT 'twap' AS probe, k, round(SUM(value * dur) / SUM(dur), 6) AS v " +
          "FROM tw GROUP BY k " +
          "UNION ALL " +
          "SELECT 'zscore' AS probe, zi.k, round(MAX((value - m) / sd), 6) AS v " +
          "FROM zi JOIN zs USING (k) GROUP BY zi.k " +
          "UNION ALL " +
          "SELECT 'ewma_div' AS probe, CAST(k AS BIGINT) AS k, round(num / den, 6) AS v " +
          "FROM (VALUES (1, 3.0, 0.0), (2, 3.0, 2.0)) t(k, num, den) " +
          "UNION ALL " +
          "SELECT 'mean_shift' AS probe, CAST(k AS BIGINT) AS k, " +
          "round((m_live - m_ref) / sd_ref, 4) AS v " +
          "FROM (VALUES (1, 3.0, 2.0, 0.0), (2, 3.0, 2.0, 0.5)) t(k, m_live, m_ref, sd_ref) " +
          "UNION ALL " +
          "SELECT 'mw_z' AS probe, k, round((u_stat - CAST(n_a AS DOUBLE) * n_b / 2.0) / " +
          "sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0 * (CAST(n_a + n_b + 1 AS DOUBLE) - " +
          "CAST(ties AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 4) AS v " +
          "FROM mw " +
          "UNION ALL " +
          "SELECT 'es_key' AS probe, CAST(k AS BIGINT) AS k, " +
          "round(pow(u, 1.0 / n_chars), 9) AS v " +
          "FROM (VALUES (1, CAST(0.25 AS DOUBLE), 0), (2, 0.25, 2)) t(k, u, n_chars) " +
          "UNION ALL " +
          "SELECT 'digit_ratio' AS probe, CAST(k AS BIGINT) AS k, " +
          "round(len(regexp_extract_all(text, '[0-9]')) / CAST(length(text) AS DOUBLE), 6) AS v " +
          "FROM (VALUES (1, ''), (2, 'a1b2')) t(k, text) " +
          "UNION ALL " +
          // the mw_rank oracle arm states the SAME population rule the
          // shared mwRankedBins encodes: the NULL bin is excluded
          // BEFORE ranking — DuckDB unfiltered would rank it LAST where
          // Spark ranks it FIRST, so a regressed filter diverges the
          // hash from either side
          "SELECT 'mw_rank' AS probe, k, CAST(SUM(ca * r2) AS DOUBLE) AS v FROM (" +
          // CAST: DuckDB window SUM promotes to HUGEINT
          "SELECT k, ca, 2 * (CAST(SUM(cnt) OVER (PARTITION BY k ORDER BY v " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - cnt) + cnt + 1 AS r2 " +
          "FROM (SELECT k, v, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(is_a) AS BIGINT) AS ca " +
          "FROM (SELECT CAST(k AS BIGINT) AS k, CAST(floor(value * 10.0) AS BIGINT) AS v, is_a " +
          "FROM (VALUES (1, 1.0, 1), (1, NULL, 1), (1, 2.0, 0), " +
          "(2, 1.0, 1), (2, 2.0, 1), (2, 3.0, 0)) t(k, value, is_a)) " +
          "WHERE v IS NOT NULL GROUP BY k, v)) GROUP BY k " +
          "UNION ALL " +
          "SELECT 'try_cast' AS probe, CAST(k AS BIGINT) AS k, TRY_CAST(sv AS DOUBLE) AS v " +
          "FROM (VALUES (1, 'abc'), (2, '7')) t(k, sv) " +
          "UNION ALL " +
          "SELECT 'array_read' AS probe, CAST(k AS BIGINT) AS k, a[i] AS v " +
          "FROM (SELECT k, CAST(a AS DOUBLE[]) AS a, i " +
          "FROM (VALUES (1, [0.5, 0.25], 5), (2, [0.5, 0.25], 2)) t(k, a, i))"),
    ),
  )
}

package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All computations are integer-exact or derived from exact integers so
  * the DuckDB oracle hash-matches bit-for-bit: counts come from
  * `regexp_count`/`split` sizes (regexp_count counts matches without
  * materializing a per-row match array — ~6× on regex-heavy scans;
  * the DuckDB oracles keep `len(regexp_extract_all(...))`, which is
  * match-for-match equivalent), ratios are single IEEE divisions of
  * identical integers, fingerprints are md5.
  *
  * Scale: every query is a narrow projection + per-row scalar work —
  * embarrassingly parallel, no shuffle except the final nothing. At
  * 100 TB these run at scan speed.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  // language marker lexicons (tiny function-word profiles)
  private val markers = Seq(
    "en" -> "\\b(the|a|is|of|and)\\b",
    "es" -> "\\b(el|la|de|que|y)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|les|et|est|une)\\b",
  )

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q21_fingerprint",
      (s, dir) =>
        docs(s, dir).select(
          col("doc_id"),
          expr("md5(text)").as("fp"),
          expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)").as("fp64")),
      Some(
        "SELECT doc_id, md5(text) AS fp, " +
          "('0x' || substr(md5(text), 1, 15))::BIGINT AS fp64 FROM documents"),
    ),
    QuerySpec(
      "q22_token_count",
      (s, dir) =>
        docs(s, dir).select(
          col("doc_id"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"),
          expr("CAST(regexp_count(text, '[a-z]+') AS BIGINT)").as("n_word_tokens"),
          // honest name: this is a regex CLASS split (word/number/punct
          // runs), not BPE — the real BPE tokenizer is q22b
          expr("CAST(regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]') AS BIGINT)")
            .as("n_regex_tokens"),
          expr("CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(split(text, ' '))")
            .as("mean_token_len")),
      Some(
        "SELECT doc_id, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
          "CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens, " +
          "CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_regex_tokens, " +
          "CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_token_len " +
          "FROM documents"),
    ),
    QuerySpec(
      // Real fixed-merge-table BPE (graft.functions.Bpe): greedy
      // byte-pair merging with a hardcoded 122-merge table, as a native
      // codegen'd expression. The oracle replays the identical
      // rank-order replace chain in SQL.
      "q22b_bpe_tokens",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        // NULL-text docs dropped on BOTH sides (same contract as q24b):
        // the oracle's unnest(string_split(...)) silently drops them
        // while the null-intolerant expression would keep a NULL row
        docs(s, dir)
          .filter(col("text").isNotNull)
          .select(
            col("doc_id"),
            expr("bpe_token_count(text)").as("n_bpe_tokens"))
      },
      Some(graft.functions.Bpe.duckdbOracleSql),
    ),
    QuerySpec(
      "q23_quality_score",
      (s, dir) =>
        docs(s, dir)
          .withColumn("n_tokens", expr("size(split(text, ' '))"))
          .withColumn("stop_cnt", expr("regexp_count(text, '\\\\b(the|a)\\\\b')"))
          .withColumn("digit_cnt", expr("regexp_count(text, '[0-9]')"))
          .select(
            col("doc_id"),
            col("n_tokens").cast("bigint").as("n_tokens"),
            col("stop_cnt").cast("bigint").as("stop_cnt"),
            col("digit_cnt").cast("bigint").as("digit_cnt"),
            expr("CAST(stop_cnt AS DOUBLE) / n_tokens").as("stop_ratio"),
            // `D` suffixes: Spark parses a bare `100.0` literal as
            // DECIMAL(3,1) and would run the whole score in decimal
            // arithmetic (emitting DecimalType), while the oracle works
            // in IEEE doubles — force double math end to end.
            expr("round(least(n_tokens / 100.0D, 1.0D) * 0.5D " +
              "+ least(5.0D * stop_cnt / n_tokens, 1.0D) * 0.5D, 6)").as("quality")),
      Some(
        "WITH b AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, " +
          "len(regexp_extract_all(text, '\\b(the|a)\\b')) AS stop_cnt, " +
          "len(regexp_extract_all(text, '[0-9]')) AS digit_cnt FROM documents) " +
          "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, " +
          "CAST(stop_cnt AS BIGINT) AS stop_cnt, CAST(digit_cnt AS BIGINT) AS digit_cnt, " +
          "CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio, " +
          "round(least(n_tokens / 100.0, 1.0) * 0.5 " +
          "+ least(5.0 * stop_cnt / n_tokens, 1.0) * 0.5, 6) AS quality FROM b"),
    ),
    QuerySpec(
      // Winnowing fingerprint via the native rolling-hash expression
      // (graft.functions.RollingHashMin): min Rabin-Karp hash over all
      // 16-byte windows, one codegen'd pass per row. The oracle
      // recomputes each window independently (O(len·k)) — same values.
      "q24b_rolling_fingerprint",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        docs(s, dir)
          // empty/NULL text has no windows to fingerprint — excluded on
          // both sides (the oracle's length(text) > 0 drops them too)
          .filter(col("text").isNotNull && length(col("text")) > 0)
          .select(
            col("doc_id"),
            expr("rolling_hash_min(text, 16)").as("fp_rolling"))
      },
      Some(
        // k = least(16, len) so docs shorter than the window still hash
        // their full length (one window) — matching the expression's
        // documented clamp semantics
        "WITH RECURSIVE powers(e, v) AS (" +
          "SELECT 0, CAST(1 AS BIGINT) UNION ALL " +
          "SELECT e + 1, v * 257 % 1000003 FROM powers WHERE e < 15), " +
          "d AS (SELECT doc_id, text, LEAST(16, length(text)) AS k FROM documents " +
          "WHERE length(text) > 0), " +
          "w AS (SELECT doc_id, text, k, i FROM d, " +
          "unnest(range(1, length(text) - k + 2)) AS u(i)), " +
          "h AS (SELECT doc_id, i, " +
          "SUM(ord(substr(text, CAST(i + j AS INT), 1)) * v) % 1000003 AS wh " +
          "FROM w, unnest(range(0, k)) AS t(j) JOIN powers p ON p.e = k - 1 - j " +
          "GROUP BY doc_id, i) " +
          // CAST: DuckDB promotes integer SUM to HUGEINT, which the driver
          // hashes as float64 while Spark emits int64 — cast back to BIGINT
          "SELECT doc_id, CAST(MIN(wh) AS BIGINT) AS fp_rolling FROM h GROUP BY doc_id"),
    ),
    QuerySpec(
      "q24_langid",
      (s, dir) => {
        val hits = markers.foldLeft(docs(s, dir)) { case (df, (lang, re)) =>
          df.withColumn(
            s"${lang}_hits",
            expr(s"CAST(regexp_count(text, '${re.replace("\\", "\\\\")}') AS BIGINT)"))
        }
        hits.select(
          col("doc_id") +: col("lang").as("labeled_lang") +:
            markers.map { case (l, _) => col(s"${l}_hits") } :+
            expr(
              "CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en' " +
                "WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 THEN 'es' " +
                "WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de' " +
                "WHEN fr_hits > 0 THEN 'fr' ELSE 'und' END").as("predicted_lang"): _*)
      },
      Some {
        val hitCols = markers
          .map { case (l, re) => s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS ${l}_hits" }
          .mkString(", ")
        s"WITH h AS (SELECT doc_id, lang AS labeled_lang, $hitCols FROM documents) " +
          "SELECT doc_id, labeled_lang, en_hits, es_hits, de_hits, fr_hits, " +
          "CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en' " +
          "WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 THEN 'es' " +
          "WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de' " +
          "WHEN fr_hits > 0 THEN 'fr' ELSE 'und' END AS predicted_lang FROM h"
      },
    ),
    QuerySpec(
      // BM25 relevance scoring against a fixed query-term set — the
      // standard retrieval/quality-ranking primitive over a corpus.
      // Plan shape: one tf groupBy on (doc, term) AFTER filtering to
      // the query terms (the filter pushes to the scan, so the shuffle
      // carries only query-term hits, not the whole vocabulary); df and
      // the corpus stats (N, avgdl) are tiny aggregates broadcast back.
      // At 100 TB the only big shuffle is tf over matching terms.
      "q52_bm25",
      (s, dir) => {
        val qTerms = Seq("spark", "vector", "window")
        val k1 = lit(1.2d)
        val b = lit(0.75d)
        val d = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .withColumn("dl", size(col("w")).cast("bigint"))
        val stats = d.agg(
          count(lit(1)).as("n_docs"),
          avg(col("dl")).as("avgdl"))
        val tf = d
          .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
          .filter(col("term").isin(qTerms: _*))
          .groupBy("doc_id", "dl", "term")
          .agg(count(lit(1)).as("tf"))
        // (doc_id, term) is already unique in tf (it's the groupBy
        // output), so a plain count IS the document frequency — no
        // distinct-aggregate Expand needed
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val idf = log(
          (col("n_docs") - col("df") + lit(0.5d)) / (col("df") + lit(0.5d)) + lit(1.0d))
        val contrib = idf *
          (col("tf") * (k1 + lit(1.0d))) /
          (col("tf") + k1 * (lit(1.0d) - b + b * col("dl") / col("avgdl")))
        val scored = tf
          .join(broadcast(dfreq), "term")
          .crossJoin(broadcast(stats))
          .withColumn("contrib", contrib)
          .groupBy("doc_id")
          .agg(sum("contrib").as("bm25"))
        d.select(col("doc_id"), col("dl"))
          .join(scored, Seq("doc_id"), "left")
          .withColumn("bm25", coalesce(col("bm25"), lit(0.0d)))
      },
      Some(
        "WITH dd AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl, " +
          "string_split(text, ' ') AS ws FROM documents), " +
          "st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dd), " +
          "tf AS (SELECT doc_id, dl, w AS term, COUNT(*) AS tf FROM dd, unnest(ws) AS t(w) " +
          "WHERE w IN ('spark', 'vector', 'window') GROUP BY doc_id, dl, w), " +
          "dfx AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term), " +
          "sc AS (SELECT tf.doc_id, SUM(ln((st.n_docs - dfx.df + 0.5) / (dfx.df + 0.5) + 1) * " +
          "(tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / st.avgdl))) AS bm25 " +
          "FROM tf JOIN dfx ON tf.term = dfx.term CROSS JOIN st GROUP BY tf.doc_id) " +
          "SELECT dd.doc_id, dd.dl, COALESCE(sc.bm25, 0.0) AS bm25 " +
          "FROM dd LEFT JOIN sc ON dd.doc_id = sc.doc_id"),
    ),
    QuerySpec(
      // Corpus-wide top-k term frequency — the vocabulary/frequency-table
      // pass every tokenizer build starts from. Scale shape: explode
      // happens map-side, the partial count aggregates BEFORE the
      // shuffle (map-side combine), so the exchange carries one row per
      // (partition, distinct term), not one per token; the final top-25
      // is a TakeOrderedAndProject, never a global sort of the
      // vocabulary. Term tie-break makes the cut deterministic.
      "q72_top_terms",
      (s, dir) =>
        docs(s, dir)
          .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
          .groupBy("term")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term"))
          .limit(25),
      Some(
        "SELECT term, COUNT(*) AS n FROM (" +
          "SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term " +
          "FROM documents) t GROUP BY term ORDER BY n DESC, term LIMIT 25"),
    ),
    QuerySpec(
      // Overlapping text chunking: fixed 200-char windows at stride 150
      // (50-char overlap) — the context-window prep step for embedding /
      // RAG pipelines. Pure map-side explode (sequence + substring): no
      // shuffle at all; output rows ≈ n_chars/150 per doc. 1-based
      // offsets so Spark substring and DuckDB substr index identically;
      // both count characters, not bytes.
      "q95_chunk_overlap",
      (s, dir) =>
        docs(s, dir)
          .filter(length(col("text")) >= 1)
          .select(
            col("doc_id"),
            explode(expr("sequence(1, length(text), 150)")).as("pos"),
            col("text"))
          .select(
            col("doc_id"),
            ((col("pos") - 1) / 150).cast("bigint").as("chunk_idx"),
            expr("substring(text, pos, 200)").as("chunk")),
      Some(
        "SELECT doc_id, CAST((i - 1) // 150 AS BIGINT) AS chunk_idx, " +
          "substr(text, i, 200) AS chunk " +
          "FROM documents, unnest(range(1, length(text) + 1, 150)) AS u(i) " +
          "WHERE length(text) >= 1"),
    ),
    QuerySpec(
      // Per-document TF-IDF top-3 terms — the keyword-extraction /
      // salient-term pass (q52's BM25 scores a QUERY against docs; this
      // characterizes each doc standalone). Ranking is INTEGER-only
      // (tf desc, df asc, term asc) so the top-3 cut is cross-engine
      // exact even where two terms' float tfidf values are near-equal;
      // the float tfidf rides along as a value column. Scale shape:
      // explode map-side → two map-side-combinable groupBys; the df
      // side is vocabulary-sized so its join broadcasts; the corpus
      // count is a broadcast scalar.
      "q98_tfidf_top_terms",
      (s, dir) => {
        val terms = docs(s, dir)
          .select(
            col("doc_id"),
            explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs(s, dir).select(count(lit(1)).as("n_docs"))
        tf.join(broadcast(df), "term")
          .crossJoin(broadcast(n))
          .withColumn(
            "rk",
            row_number()
              .over(Window.partitionBy("doc_id")
                .orderBy(col("tf").desc, col("df").asc, col("term").asc))
              .cast("bigint"))
          .filter(col("rk") <= 3)
          .select(
            col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
            (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
      },
      Some(
        "WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term " +
          "FROM documents), " +
          "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2), " +
          "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), " +
          "n AS (SELECT COUNT(*) AS n_docs FROM documents) " +
          "SELECT doc_id, rk, term, tf, df, tfidf FROM (" +
          "SELECT tf.doc_id, tf.term, tf.tf, df.df, " +
          "tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf, " +
          "CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id " +
          "ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS BIGINT) AS rk " +
          "FROM tf JOIN df USING (term) CROSS JOIN n) x WHERE rk <= 3"),
    ),
    QuerySpec(
      // Character-entropy quality signal (the CCNet/Gopher-family
      // "garbage text" detector: near-zero entropy = repeated chars,
      // near-log2(alphabet) = random noise; natural text sits in a
      // band). Shannon entropy in bits over the character frequency
      // distribution — DuckDB's entropy() aggregate is the oracle.
      // Scale shape: per-char explode is map-side; both groupBys are
      // map-side combinable on (doc_id[, char]) — the exchange carries
      // counts, never characters. At 100 TB this folds into the same
      // scan as the other per-doc quality scalars.
      "q99_char_entropy",
      (s, dir) => {
        val freq = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
          .filter(length(col("c")) > 0)
          .groupBy("doc_id", "c")
          .agg(count(lit(1)).as("n"))
        val tot = freq.groupBy("doc_id").agg(sum("n").as("ntot"))
        freq
          .join(tot, "doc_id")
          .groupBy("doc_id")
          .agg((-sum((col("n") / col("ntot")) * log2(col("n") / col("ntot"))))
            .as("char_entropy"))
      },
      Some(
        "SELECT doc_id, entropy(c) AS char_entropy FROM (" +
          "SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents) t " +
          "GROUP BY doc_id"),
    ),
    QuerySpec(
      // Per-source unigram KL divergence vs the corpus distribution —
      // the drift/contamination monitor a mixture pipeline runs before
      // reweighting sources (a source whose token distribution diverges
      // is over-deduped, mis-scraped, or mislabeled). One token-explode
      // shuffle into (source, tok) counts, materialized once and reused
      // by the per-source totals, the corpus marginals, and the scoring
      // join; corpus total broadcasts as a single row. Sum order
      // differs across engines but the compare tolerance (1e-6 abs)
      // dwarfs double-summation error on ~1e-2 values.
      "q115_source_divergence",
      (s, dir) => {
        val st = docs(s, dir)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("n"))
          .localCheckpoint() // reused by totals, marginals, and scoring
        val stot = st.groupBy("source").agg(sum(col("n")).as("sn"))
        val corpus = st.groupBy("tok").agg(sum(col("n")).as("cn"))
        val ctot = corpus.agg(sum(col("cn")).as("ct"))
        st.join(stot, "source").join(corpus, "tok")
          .crossJoin(broadcast(ctot))
          .select(col("source"),
            ((col("n") / col("sn")) *
              log((col("n") / col("sn")) / (col("cn") / col("ct")))).as("term"))
          .groupBy("source").agg(sum(col("term")).as("kl"))
      },
      Some(
        "WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents), " +
          "st AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2), " +
          "stot AS (SELECT source, SUM(n) AS sn FROM st GROUP BY 1), " +
          "c AS (SELECT tok, SUM(n) AS cn FROM st GROUP BY 1), " +
          "ctot AS (SELECT SUM(cn) AS ct FROM c) " +
          "SELECT st.source, SUM((st.n / stot.sn) * ln((st.n / stot.sn) / (c.cn / ctot.ct))) " +
          "AS kl FROM st JOIN stot USING (source) JOIN c USING (tok) " +
          "CROSS JOIN ctot GROUP BY 1"),
    ),
    QuerySpec(
      // Gopher-style quality rule battery (Rae et al. 2021 §A1.1,
      // arXiv:2112.11446), the rules that are scan-computable and
      // non-degenerate on this fixture: word-count bounds [50, 100k],
      // mean word length in [3, 10], ≥ 2 stop-word hits, and ≤ 25%
      // single-character words; `pass` is their conjunction. Every
      // rule is exact integer arithmetic or a ratio of exact integers
      // (mean word length = (chars − spaces) / words), so both engines
      // compute bit-identical doubles and the flags cannot straddle a
      // boundary. Zero shuffles — the whole battery is scan-speed,
      // which is the point: Gopher rules run before any expensive
      // dedup pass touches the corpus.
      "q126_gopher_rules",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_words"),
            expr("CAST(length(text) AS BIGINT)").as("n_chars"),
            expr("CAST(regexp_count(text, '\\\\b(the|a|of|to|and)\\\\b') AS BIGINT)")
              .as("n_stop"),
            expr("CAST(size(filter(split(text, ' '), w -> length(w) = 1)) AS BIGINT)")
              .as("n_short"))
          .select(
            col("doc_id"), col("n_words"),
            expr("(n_chars - (n_words - 1)) / n_words").as("mean_wl"),
            expr("CAST(n_words BETWEEN 50 AND 100000 AS BIGINT)").as("wc_ok"),
            expr("CAST((n_chars - (n_words - 1)) / n_words BETWEEN 3.0D AND 10.0D AS BIGINT)")
              .as("mwl_ok"),
            expr("CAST(n_stop >= 2 AS BIGINT)").as("stop_ok"),
            expr("CAST(n_short / n_words <= 0.25D AS BIGINT)").as("short_ok"))
          .withColumn("pass",
            expr("CAST(wc_ok + mwl_ok + stop_ok + short_ok = 4 AS BIGINT)")),
      Some(
        "WITH b AS (SELECT doc_id, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
          "CAST(length(text) AS BIGINT) AS n_chars, " +
          "CAST(len(regexp_extract_all(text, '\\b(the|a|of|to|and)\\b')) AS BIGINT) AS n_stop, " +
          "CAST(len(list_filter(string_split(text, ' '), w -> length(w) = 1)) AS BIGINT) AS n_short " +
          "FROM documents) " +
          "SELECT doc_id, n_words, " +
          "(n_chars - (n_words - 1)) / n_words AS mean_wl, " +
          "CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS wc_ok, " +
          "CAST((n_chars - (n_words - 1)) / n_words BETWEEN 3.0 AND 10.0 AS BIGINT) AS mwl_ok, " +
          "CAST(n_stop >= 2 AS BIGINT) AS stop_ok, " +
          "CAST(n_short / n_words <= 0.25 AS BIGINT) AS short_ok, " +
          "CAST(wc_ok + mwl_ok + stop_ok + short_ok = 4 AS BIGINT) AS pass FROM b"),
    ),
    QuerySpec(
      // Flesch reading-ease scoring — the classic readability quality
      // signal for curriculum/quality bucketing. Sentences = [.!?]+
      // runs (floored at 1), words = space-split size, syllables =
      // [aeiouy]+ vowel groups over the lowercased text (the standard
      // dictionary-free heuristic). All three are exact integer counts
      // from the SAME RE2-compatible regexes in both engines, and the
      // score is the identical IEEE double expression
      // 206.835 - 1.015*(w/s) - 84.6*(syl/w), so cross-engine results
      // are bit-identical and the band CASE cannot straddle a boundary.
      // Zero shuffles — scan-speed, like the Gopher battery it
      // complements (q126 gates structure, q147 grades difficulty).
      "q147_readability",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_words"),
            // regexp_count, not size(regexp_extract_all(...)): counting
            // must not materialize a match array per row
            expr("CAST(greatest(regexp_count(text, '[.!?]+'), 1) AS BIGINT)")
              .as("n_sents"),
            expr("CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)")
              .as("n_syll"))
          .withColumn("flesch",
            expr("206.835D - 1.015D * (CAST(n_words AS DOUBLE) / n_sents) " +
              "- 84.6D * (CAST(n_syll AS DOUBLE) / n_words)"))
          .withColumn("band",
            expr("CASE WHEN flesch >= 90.0D THEN 'very_easy' " +
              "WHEN flesch >= 60.0D THEN 'standard' " +
              "WHEN flesch >= 30.0D THEN 'difficult' ELSE 'very_confusing' END"))
          .withColumn("flesch", round(col("flesch"), 4)),
      Some(
        "WITH b AS (SELECT doc_id, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
          "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sents, " +
          "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll " +
          "FROM documents), " +
          "sc AS (SELECT doc_id, n_words, n_sents, n_syll, " +
          "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents) " +
          "- 84.6 * (CAST(n_syll AS DOUBLE) / n_words) AS flesch FROM b) " +
          "SELECT doc_id, n_words, n_sents, n_syll, round(flesch, 4) AS flesch, " +
          "CASE WHEN flesch >= 90.0 THEN 'very_easy' " +
          "WHEN flesch >= 60.0 THEN 'standard' " +
          "WHEN flesch >= 30.0 THEN 'difficult' ELSE 'very_confusing' END AS band FROM sc"),
    ),
    QuerySpec(
      // Bigram language-model scoring — the LM-perplexity quality
      // signal pretraining pipelines use (here an exact corpus-trained
      // bigram model with add-one smoothing rather than an external
      // LM): each doc scores avg ln P(wᵢ | wᵢ₋₁) under counts trained
      // on the whole corpus. Shapes: bigram generation is a
      // zero-shuffle array transform in the scan stage; the model is
      // two combinable groupBys (bigram- and unigram-keyed); scoring
      // re-joins the doc bigrams to both count frames on their keys;
      // the vocabulary size rides a count-over-window on the
      // vocab-sized unigram frame (never corpus-sized, no single-row
      // cross join). At 100 TB every stage is keyed or scan-local.
      "q162_bigram_lm",
      (s, dir) => {
        val big = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("tok"))
          .filter(size(col("tok")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(tok) - 1), " +
              "i -> struct(tok[i - 1] AS w1, tok[i] AS w2))")).as("bg"))
          .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
        val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
          .withColumn("v", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
        big.join(c12, Seq("w1", "w2"))
          .join(c1, Seq("w1"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_bigrams"),
            round(avg(log((col("c12") + 1.0) / (col("c1") + col("v")))), 6)
              .as("avg_lp"))
      },
      Some(
        "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents), " +
          "bg AS (SELECT doc_id, unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2 " +
          "FROM tok WHERE len(l) >= 2), " +
          "c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2), " +
          "c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1), " +
          "v AS (SELECT COUNT(*) AS v FROM c1) " +
          "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, " +
          "round(AVG(ln((c12.c12 + 1.0) / (c1.c1 + v.v))), 6) AS avg_lp " +
          "FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v " +
          "GROUP BY doc_id"),
    ),
    QuerySpec(
      // Inverted-index construction — the search-engine build step:
      // per term, document frequency over the whole corpus plus the
      // FIRST 32 postings (doc ids ascending) as a bounded sample.
      // Scale shapes: distinct (term, doc) pairs are derived IN the
      // scan row (array_distinct — doc_id is unique per row, so no
      // cross-row dedup exists to shuffle for); df is a counting agg
      // on that frame; the postings
      // sample is rank-window + collect of ≤ 32 ids — WindowGroupLimit
      // prunes before the list ever materializes, so no posting list
      // is corpus-sized in memory even for a stopword. (A full
      // posting-list export would be the q73 sorted-write path; the
      // capped sample is what fits a row.)
      "q164_inverted_index",
      (s, dir) => {
        val pairs = docs(s, dir)
          // per-doc distinct in the row (array_distinct): doc_id is
          // unique, so the post-explode distinct() this replaces only
          // deduped within one row — its full exchange of the exploded
          // token stream is removed (r20, guide §2.4)
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("term"))
        val dfCounts = pairs.groupBy("term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("term").orderBy(col("doc_id").asc)
        val sample = pairs
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 32)
          .groupBy("term")
          .agg(concat_ws(",",
            expr("transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))"))
            .as("postings"))
        dfCounts.join(sample, Seq("term"))
      },
      Some(
        "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
          "d AS (SELECT DISTINCT doc_id, term FROM t), " +
          "df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM d GROUP BY 1), " +
          "r AS (SELECT term, doc_id, row_number() OVER (PARTITION BY term " +
          "ORDER BY doc_id ASC) AS rk FROM d), " +
          "p AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id ASC) " +
          "AS postings FROM r WHERE rk <= 32 GROUP BY 1) " +
          "SELECT term, df, postings FROM df JOIN p USING (term)"),
    ),
    QuerySpec(
      // Sliding-window chunking with overlap — the standard LLM
      // context-window prep (window 64 tokens, stride 48, 16-token
      // overlap so no boundary context is lost; contrast q165's CDC
      // chunking, which cuts content-defined instead of fixed-stride).
      // Pure per-row arithmetic: token count → explode one
      // chunk-index sequence per doc — a zero-shuffle narrow
      // transform whose fan-out is n_tokens/stride, never
      // corpus-shaped. Chunk boundaries are integer token offsets;
      // the materialized slice stays in the engine's explode, so the
      // text itself is never copied per chunk here.
      "q189_overlap_chunks",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
        d.withColumn("chunk_id",
            explode(expr("sequence(0L, (n_tok - 1) div 48)")))
          .select(
            col("doc_id"), col("n_tok"), col("chunk_id"),
            (col("chunk_id") * 48).as("start_tok"),
            least(col("chunk_id") * 48 + 64, col("n_tok")).as("end_tok"))
          .withColumn("n_tok_chunk", col("end_tok") - col("start_tok"))
      },
      Some(
        "WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok " +
          "FROM documents) " +
          "SELECT doc_id, n_tok, k AS chunk_id, k * 48 AS start_tok, " +
          "LEAST(k * 48 + 64, n_tok) AS end_tok, " +
          "LEAST(k * 48 + 64, n_tok) - k * 48 AS n_tok_chunk " +
          "FROM d, LATERAL (SELECT CAST(unnest(generate_series(0, (n_tok - 1) // 48)) AS BIGINT) AS k)"),
    ),
    QuerySpec(
      // Multinomial Naive Bayes language classifier — supervised ML as
      // pure relational algebra (q176's PCA move, applied to
      // classification): train on the 4-in-5 doc_id split, predict the
      // held-out fifth. The add-1-smoothed log-likelihood decomposes
      // so that ABSENT (token, class) counts contribute exactly zero:
      //   score(d, l) = log prior_l − n_d·log(N_l + V)
      //              + Σ_{tok∈d} tf·log(c_{tok,l} + 1)
      // — so the only corpus-sized join is test-tokens ⋈ train-counts
      // on the token key (missing pairs simply drop out), and the
      // per-class constants ride in on a ≤5-row broadcast class frame.
      // Model state = the (token, class) count table: a DataFrame, not
      // a driver object — it merges, persists, and scales like any
      // other relation. Argmax via one doc-keyed window with
      // deterministic (score, lang) tie order.
      "q203_naive_bayes",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir).select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        val train = d.filter(col("doc_id") % 5 =!= 0)
        val test = d.filter(col("doc_id") % 5 === 0)
          .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tf"))
        val counts = train.groupBy("tok", "lang").agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val vocab = counts.select("tok").distinct().count()
        val classes = counts.groupBy("lang").agg(sum(col("c")).as("n_l"))
        val docsPerClass = docs(s, dir).filter(col("doc_id") % 5 =!= 0)
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        val classConst = classes.join(docsPerClass, Seq("lang"))
          .withColumn("total_docs", sum(col("n_docs")).over(Window.partitionBy()))
          .select(col("lang").as("cl"),
            (log(col("n_docs").cast("double") / col("total_docs")) ).as("log_prior"),
            log(col("n_l").cast("double") + vocab).as("log_denom"))
        val tokScore = test
          .join(counts.select(col("tok"), col("lang").as("cl"), col("c")), Seq("tok"))
          .groupBy("doc_id", "cl")
          .agg(sum(col("tf") * log(col("c").cast("double") + 1)).as("tok_ll"))
        val docLen = test.groupBy("doc_id", "lang")
          .agg(sum(col("tf")).as("n_d"))
        val scored = docLen
          .crossJoin(broadcast(classConst)) // ≤5 classes — bounded by schema
          .join(tokScore, Seq("doc_id", "cl"), "left")
          .withColumn("score",
            col("log_prior") - col("n_d") * col("log_denom") +
              coalesce(col("tok_ll"), lit(0.0)))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cl"))
        scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select(col("doc_id"), col("lang").as("true_lang"), col("cl").as("pred_lang"),
            (col("lang") === col("cl")).as("correct"),
            round(col("score"), 4).as("log_score"))
      },
      Some(
        "WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok " +
          "FROM documents), " +
          "train AS (SELECT * FROM toks WHERE doc_id % 5 != 0), " +
          "test AS (SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS tf " +
          "FROM toks WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3), " +
          "counts AS (SELECT tok, lang AS cl, CAST(COUNT(*) AS BIGINT) AS c " +
          "FROM train GROUP BY 1, 2), " +
          "v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM counts), " +
          "cls AS (SELECT cl, SUM(c) AS n_l FROM counts GROUP BY 1), " +
          "dpc AS (SELECT lang AS cl, CAST(COUNT(*) AS BIGINT) AS n_docs " +
          "FROM documents WHERE doc_id % 5 != 0 GROUP BY 1), " +
          "cc AS (SELECT cls.cl, ln(n_docs / CAST(SUM(n_docs) OVER () AS DOUBLE)) AS log_prior, " +
          "ln(CAST(n_l AS DOUBLE) + vocab) AS log_denom FROM cls JOIN dpc USING (cl), v), " +
          "ts AS (SELECT t.doc_id, c.cl, SUM(t.tf * ln(CAST(c.c AS DOUBLE) + 1)) AS tok_ll " +
          "FROM test t JOIN counts c USING (tok) GROUP BY 1, 2), " +
          "dl AS (SELECT doc_id, lang, CAST(SUM(tf) AS BIGINT) AS n_d FROM test GROUP BY 1, 2), " +
          "sc AS (SELECT dl.doc_id, dl.lang, cc.cl, " +
          "cc.log_prior - dl.n_d * cc.log_denom + COALESCE(ts.tok_ll, 0.0) AS score " +
          "FROM dl CROSS JOIN cc LEFT JOIN ts ON ts.doc_id = dl.doc_id AND ts.cl = cc.cl) " +
          "SELECT doc_id, lang AS true_lang, cl AS pred_lang, lang = cl AS correct, " +
          "round(score, 4) AS log_score FROM sc " +
          "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cl) = 1"),
    ),
  )
}

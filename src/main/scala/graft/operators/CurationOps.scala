package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data curation operators over `documents`: deterministic
  * hash splits, weighted source mixing, PII detection/redaction,
  * repetition (Gopher-style) metrics, bloom-filter blocklist pruning,
  * sequence packing, and text normalization.
  *
  * Everything here is DETERMINISTIC — sampling and splits come from
  * md5 of stable keys, never from RNG state — so a 100 TB run is
  * reproducible row-for-row and every query gets a DuckDB hash oracle.
  *
  * Scale posture: q44/q45/q46/q50 are per-row scalar work at scan
  * speed (no shuffle). q47 is one explode + one map-side-combinable
  * groupBy. q49 windows are partitioned by `source` (never a global
  * single-partition window). q48's bloom prune broadcasts a sketch of
  * the SMALL blocklist so the 100 TB side sheds rows before the exact
  * anti-join shuffle.
  */
object CurationOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** 0..99 bucket from md5 of (salt ++ key) — the reproducible
    * cluster-stable substitute for rand(): any executor, any retry,
    * any engine computes the same bucket for the same row.
    */
  private def hashBucket(salt: String, keyExpr: String): String =
    s"pmod(CAST(conv(substr(md5(concat('$salt', $keyExpr)), 1, 15), 16, 10) AS BIGINT), 100)"

  private def duckBucket(salt: String, keyExpr: String): String =
    s"(('0x' || substr(md5('$salt' || $keyExpr), 1, 15))::BIGINT % 100)"

  /** q163's A-ES sampling key with the zero-weight degenerate
    * DECLARED: weight 0 (an empty doc, n_chars = 0) has no defined
    * key — the guard yields NULL, which both engines rank last under
    * DESC (never sampled), where the unguarded 1.0/0 would throw under
    * Spark's ANSI session default while DuckDB returns NULL (r16
    * ANSI-division sweep). Shared with q209's degenerate probe so the
    * gate exercises THIS expression, not a copy.
    */
  private[graft] def esKey(u: Column, nChars: Column): Column =
    pow(u, lit(1.0) / when(nChars =!= 0, nChars))

  /** q200's quality ratio with the empty-document degenerate DECLARED:
    * length 0 makes the divisor exactly 0.0 — ANSI throws where
    * DuckDB's x/0 is NULL; nullif pins both engines to NULL, and the
    * NULL ratio then falls out of any comparison (r16 ANSI-division
    * sweep). Requires a `text` column in scope. Shared with q209's
    * degenerate probe.
    */
  private[graft] def digitRatio: Column =
    expr("regexp_count(text, '[0-9]') / nullif(CAST(length(text) AS DOUBLE), 0.0D)")

  // RE2-compatible PII patterns (no backrefs/lookaround) so the Java
  // regex engine and DuckDB's RE2 agree match-for-match.
  private val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  private val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      // Deterministic train/val/test assignment: bucket = md5(doc_id)
      // mod 100, 80/10/10. This is how a 100 TB corpus gets a stable
      // split — no sampling state, no shuffle, recomputable per row.
      "q44_split_hash",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            col("source"),
            expr(hashBucket("split:", "CAST(doc_id AS STRING)")).as("bucket"))
          .withColumn(
            "split",
            expr("CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END")),
      Some(
        s"SELECT doc_id, source, ${duckBucket("split:", "CAST(doc_id AS VARCHAR)")} AS bucket, " +
          "CASE WHEN " + duckBucket("split:", "CAST(doc_id AS VARCHAR)") + " < 80 THEN 'train' " +
          "WHEN " + duckBucket("split:", "CAST(doc_id AS VARCHAR)") + " < 90 THEN 'val' " +
          "ELSE 'test' END AS split FROM documents"),
    ),
    QuerySpec(
      // Weighted mixture sampling: each source keeps a deterministic
      // fraction (src0→5% … src19→100%) — the "sample sources at
      // different rates into one training mix" op. Same hash-bucket
      // trick; the filter pushes to the scan, kept rows carry their
      // sampling metadata for downstream loss weighting. The rate
      // parse is LOUD by construction (try_cast + raise_error): a
      // malformed source name must kill the job, not ride a NULL
      // keep_pct into `bucket < NULL` = unknown and silently drop the
      // source from the mix — the silent-data-loss class of the r15
      // pipeline review, and mode-dependent besides (ANSI CAST throws,
      // non-ANSI nulls). DuckDB's oracle CAST already errors loudly on
      // a non-NULL garbage name, so this pins both engines to the same
      // loud contract (r16). A NULL source is the one case the two
      // contracts split (r16 ADVICE): DuckDB's CAST(NULL) is silently
      // NULL, and SQL row-ledger semantics treat an absent dimension
      // as unknown, not malformed — so NULL keeps keep_pct NULL (the
      // row drops from the mix, `bucket < NULL` is never true,
      // IDENTICALLY on both engines) and only a non-NULL unparseable
      // name kills the job.
      "q45_source_mixture",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            col("source"),
            expr("CASE WHEN source IS NULL THEN CAST(NULL AS BIGINT) " +
              "WHEN TRY_CAST(substr(source, 4) AS INT) IS NULL THEN " +
              "CAST(raise_error(concat('q45_source_mixture: unparseable source id: ', " +
              "source)) AS BIGINT) " +
              "ELSE CAST(TRY_CAST(substr(source, 4) AS INT) * 5 + 5 AS BIGINT) END")
              .as("keep_pct"),
            expr(hashBucket("mix:", "CAST(doc_id AS STRING)")).as("bucket"))
          .filter(col("bucket") < col("keep_pct")),
      Some(
        "WITH m AS (SELECT doc_id, source, " +
          "CAST(CAST(substr(source, 4) AS INT) * 5 + 5 AS BIGINT) AS keep_pct, " +
          s"${duckBucket("mix:", "CAST(doc_id AS VARCHAR)")} AS bucket FROM documents) " +
          "SELECT doc_id, source, keep_pct, bucket FROM m WHERE bucket < keep_pct"),
    ),
    QuerySpec(
      // PII detect + redact. The fixture text is synthetic and carries
      // no PII, so the query FIRST derives an augmented column with
      // deterministic fixture-keyed contact strings (same derivation in
      // the oracle), then counts and redacts — the regex path is
      // exercised with real hits instead of vacuous zeros.
      "q46_pii_redact",
      (s, dir) =>
        docs(s, dir)
          .withColumn(
            "aug",
            expr("concat(text, ' contact user', CAST(doc_id AS STRING), '@', source, " +
              "'.org or 555-', lpad(CAST(pmod(doc_id, 10000) AS STRING), 4, '0'), " +
              "' from 10.0.', CAST(pmod(doc_id, 256) AS STRING), '.7')"))
          .select(
            col("doc_id"),
            regexp_count(col("aug"), lit(emailRe)).cast("bigint").as("n_emails"),
            regexp_count(col("aug"), lit(phoneRe)).cast("bigint").as("n_phones"),
            regexp_count(col("aug"), lit(ipRe)).cast("bigint").as("n_ips"),
            regexp_replace(
              regexp_replace(
                regexp_replace(col("aug"), lit(emailRe), lit("<EMAIL>")),
                lit(ipRe), lit("<IP>")),
              lit(phoneRe), lit("<PHONE>")).as("redacted")),
      Some {
        val aug = "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source || " +
          "'.org or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
          "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
        s"WITH a AS (SELECT doc_id, $aug AS aug FROM documents) " +
          s"SELECT doc_id, CAST(len(regexp_extract_all(aug, '$emailRe')) AS BIGINT) AS n_emails, " +
          s"CAST(len(regexp_extract_all(aug, '$phoneRe')) AS BIGINT) AS n_phones, " +
          s"CAST(len(regexp_extract_all(aug, '$ipRe')) AS BIGINT) AS n_ips, " +
          s"regexp_replace(regexp_replace(regexp_replace(aug, '$emailRe', '<EMAIL>', 'g'), " +
          s"'$ipRe', '<IP>', 'g'), '$phoneRe', '<PHONE>', 'g') AS redacted FROM a"
      },
    ),
    QuerySpec(
      // Gopher-style repetition metrics: duplicate word-bigram /
      // trigram fractions + top-bigram share. Metrics are strictly
      // PER-DOCUMENT, so everything is higher-order array work inside
      // the row — counts from size/array_distinct, the top-bigram
      // count as the longest run in the sorted gram array via
      // aggregate(). ZERO shuffles: at 100 TB this runs at scan speed,
      // where the explode→groupBy formulation would shuffle every
      // n-gram occurrence in the corpus.
      "q47_repetition",
      (s, dir) => {
        // longest run in sort_array(grams) == max occurrence count
        def topRun(grams: String): String =
          s"aggregate(sort_array($grams), " +
            "named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)), " +
            "(acc, x) -> IF(x = acc.prev, " +
            "named_struct('prev', x, 'run', acc.run + CAST(1 AS BIGINT), 'best', GREATEST(acc.best, acc.run + CAST(1 AS BIGINT))), " +
            "named_struct('prev', x, 'run', CAST(1 AS BIGINT), 'best', GREATEST(acc.best, CAST(1 AS BIGINT)))), " +
            "acc -> acc.best)"
        docs(s, dir)
          .withColumn("w", split(col("text"), " "))
          .filter(size(col("w")) >= 2)
          .withColumn(
            "bigrams",
            expr("zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
              "(a, b) -> concat(a, ' ', b))"))
          .withColumn(
            "trigrams",
            expr("CASE WHEN size(w) >= 3 THEN zip_with(slice(w, 1, size(w) - 2), " +
              "zip_with(slice(w, 2, size(w) - 2), slice(w, 3, size(w) - 2), " +
              "(b, c) -> concat(b, ' ', c)), (a, bc) -> concat(a, ' ', bc)) " +
              "ELSE CAST(array() AS ARRAY<STRING>) END"))
          .select(
            col("doc_id"),
            size(col("bigrams")).cast("bigint").as("n_bigrams"),
            expr("CAST(1.0D - CAST(size(array_distinct(bigrams)) AS DOUBLE) / size(bigrams) AS DOUBLE)")
              .as("dup_bigram_frac"),
            (expr(topRun("bigrams")).cast("double") / size(col("bigrams")).cast("double"))
              .as("top_bigram_frac"),
            expr("CAST(CASE WHEN size(trigrams) = 0 THEN 0.0D " +
              "ELSE 1.0D - CAST(size(array_distinct(trigrams)) AS DOUBLE) / size(trigrams) END AS DOUBLE)")
              .as("dup_trigram_frac"))
      },
      Some(
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents " +
          "WHERE len(string_split(text, ' ')) >= 2), " +
          "bg AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g " +
          "FROM w, unnest(range(1, len(ws))) AS u(i)), " +
          "bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g), " +
          "bga AS (SELECT doc_id, SUM(c) AS n_bigrams, COUNT(*) AS nd, MAX(c) AS topc " +
          "FROM bgc GROUP BY doc_id), " +
          "tg AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g " +
          "FROM w, unnest(range(1, len(ws) - 1)) AS u(i) WHERE len(ws) >= 3), " +
          "tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g), " +
          "tga AS (SELECT doc_id, SUM(c) AS n_trigrams, COUNT(*) AS nd FROM tgc GROUP BY doc_id) " +
          "SELECT bga.doc_id, CAST(bga.n_bigrams AS BIGINT) AS n_bigrams, " +
          "CAST(1.0 - CAST(bga.nd AS DOUBLE) / bga.n_bigrams AS DOUBLE) AS dup_bigram_frac, " +
          "CAST(bga.topc AS DOUBLE) / bga.n_bigrams AS top_bigram_frac, " +
          "CAST(CASE WHEN tga.n_trigrams IS NULL THEN 0.0 " +
          "ELSE 1.0 - CAST(tga.nd AS DOUBLE) / tga.n_trigrams END AS DOUBLE) AS dup_trigram_frac " +
          "FROM bga LEFT JOIN tga ON bga.doc_id = tga.doc_id"),
    ),
    QuerySpec(
      // Bloom-filter blocklist prune: sketch the SMALL blocklist (docs
      // whose fingerprint is "known bad" — here doc_id % 7 = 0), prune
      // the big side with mightContain (false-positive-tolerant, so
      // off the exactness path), then exact anti-join the survivors.
      // The bloom is the pattern for a blocklist too big to broadcast
      // EXACTLY (1e9 keys ≈ 1.2 GB at 1% fpp vs ~50 GB of raw keys):
      // bloom-negative rows skip the anti-join shuffle entirely, so
      // the shuffle carries only the tiny bloom-positive slice. The
      // two union branches each scan the corpus, but scans are the
      // cheap part — the shuffle they avoid is not. Oracle: the bloom
      // never drops a true match, so the result is exactly
      // "documents NOT IN blocklist".
      "q48_bloom_blocklist",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        val d = docs(s, dir).withColumn("fp", md5(col("text")))
        val blocklist = d.filter(pmod(col("doc_id"), lit(7)) === 0).select("fp")
        // size the sketch from the data — a fixed capacity saturates
        // at scale and silently degrades the prune to pure overhead
        val expected = math.max(blocklist.count(), 1000L)
        // build the sketch with Catalyst's bloom_filter_agg (a combinable
        // BINARY aggregate — the same machinery runtime row-filters use),
        // then probe with might_contain on a literal sketch: the probe
        // codegens, so the prune never drops out of WholeStageCodegen the
        // way the previous broadcast-closure UDF did
        val sketch = blocklist
          .agg(call_function("bloom_filter_agg", xxhash64(col("fp")), lit(expected)).as("bf"))
          .head().getAs[Array[Byte]]("bf")
        val hit = call_function("might_contain", lit(sketch), xxhash64(col("fp")))
        d.filter(!hit)
          .unionByName(
            // bloom-positive candidates get the exact check; survivors
            // (false positives) are re-admitted
            d.filter(hit)
              .join(blocklist.withColumnRenamed("fp", "bfp"),
                col("fp") === col("bfp"), "left_anti"))
          .select("doc_id", "source", "fp")
      },
      Some(
        "WITH d AS (SELECT doc_id, source, md5(text) AS fp FROM documents) " +
          "SELECT doc_id, source, fp FROM d WHERE fp NOT IN " +
          "(SELECT fp FROM d WHERE doc_id % 7 = 0)"),
    ),
    QuerySpec(
      // Sequence packing: assign documents to fixed token-budget
      // training sequences by running token count — the deterministic,
      // shuffle-light form of concat-then-chunk sample packing. The
      // window partitions by `source` (a pack shard), so no global
      // single-partition sort exists at any scale.
      "q49_sequence_pack",
      (s, dir) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        docs(s, dir)
          .withColumn("n_tok", size(split(col("text"), " ")).cast("bigint"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .select(
            col("doc_id"),
            col("source"),
            col("n_tok"),
            // integer `div`, not floor(double /): `/` on longs loses
            // exactness above 2^53 (same trap Tables.scala documents)
            expr("(cum - n_tok) div 512").cast("bigint").as("seq_id"),
            expr("cum - n_tok - ((cum - n_tok) div 512) * 512")
              .cast("bigint").as("seq_offset"))
      },
      Some(
        "WITH t AS (SELECT doc_id, source, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, " +
          "SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER " +
          "(PARTITION BY source ORDER BY doc_id) AS cum FROM documents) " +
          "SELECT doc_id, source, n_tok, " +
          "CAST((cum - n_tok) // 512 AS BIGINT) AS seq_id, " +
          "CAST(cum - n_tok - ((cum - n_tok) // 512) * 512 AS BIGINT) AS seq_offset FROM t"),
    ),
    QuerySpec(
      // Canonical text normalization: lowercase, strip non-alnum to
      // spaces, collapse runs, trim. Pure per-row scalar work — the
      // standard pre-dedup canonicalization pass.
      "q50_normalize_text",
      (s, dir) =>
        docs(s, dir)
          .withColumn(
            "text_norm",
            trim(regexp_replace(
              regexp_replace(lower(col("text")), lit("[^a-z0-9 ]"), lit(" ")),
              lit("  +"), lit(" "))))
          .select(
            col("doc_id"),
            col("text_norm"),
            length(col("text")).cast("bigint").as("len_raw"),
            length(col("text_norm")).cast("bigint").as("len_norm")),
      Some(
        "WITH n AS (SELECT doc_id, text, " +
          "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), " +
          "'  +', ' ', 'g')) AS text_norm FROM documents) " +
          "SELECT doc_id, text_norm, CAST(length(text) AS BIGINT) AS len_raw, " +
          "CAST(length(text_norm) AS BIGINT) AS len_norm FROM n"),
    ),
    QuerySpec(
      // Benchmark decontamination: flag test-split documents sharing a
      // 5-word shingle with any train-split document (the q44 split).
      // Shingles are fingerprinted to 60-bit ints BEFORE the join, so
      // the shuffle carries fixed-width longs, not strings; both sides
      // are per-doc-distinct (map-side combinable) and the train side
      // is globally distinct, so the equi-join is a plain hash join on
      // the fingerprint — no all-pairs doc comparison at any scale.
      "q51_decontaminate",
      (s, dir) => {
        val g = docs(s, dir)
          .withColumn("bucket", expr(hashBucket("split:", "CAST(doc_id AS STRING)")))
          .withColumn("w", split(col("text"), " "))
          .filter(size(col("w")) >= 5)
          .select(
            col("doc_id"),
            col("bucket"),
            // per-doc distinct in the row, on the FINGERPRINT — the
            // same dedup key as the post-explode distinct() this
            // replaces (bucket is doc-functional), minus its exchange
            // of the exploded gram stream per split branch (r20,
            // guide §2.4); the branch bucket filters still push below
            // the explode
            explode(expr(
              "array_distinct(transform(transform(sequence(1, size(w) - 4), " +
                "i -> concat_ws(' ', slice(w, i, 5))), " +
                "g -> CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT)))")).as("fp"))
        val train = g.filter(col("bucket") < 80).select(col("fp").as("tfp")).distinct()
        g.filter(col("bucket") >= 90)
          .join(train, col("fp") === col("tfp"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).cast("bigint").as("n_shingles"),
            count(col("tfp")).cast("bigint").as("n_contaminated"))
          .withColumn("contaminated", col("n_contaminated") > 0)
      },
      Some(
        "WITH d AS (SELECT doc_id, " +
          s"${duckBucket("split:", "CAST(doc_id AS VARCHAR)")} AS b, " +
          "string_split(text, ' ') AS ws FROM documents " +
          "WHERE len(string_split(text, ' ')) >= 5), " +
          "g AS (SELECT DISTINCT doc_id, b, ('0x' || substr(md5(" +
          "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]" +
          "), 1, 15))::BIGINT AS fp FROM d, unnest(range(1, len(ws) - 3)) AS u(i)), " +
          "tr AS (SELECT DISTINCT fp FROM g WHERE b < 80), " +
          "te AS (SELECT doc_id, fp FROM g WHERE b >= 90) " +
          "SELECT te.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles, " +
          "CAST(COUNT(tr.fp) AS BIGINT) AS n_contaminated, " +
          "COUNT(tr.fp) > 0 AS contaminated " +
          "FROM te LEFT JOIN tr ON te.fp = tr.fp GROUP BY te.doc_id"),
    ),
    QuerySpec(
      // Per-group quota sampling: exactly N docs per source, chosen by
      // md5 rank — the "balanced subset across sources" op (quota rather
      // than q45's rate). Deterministic and retry-stable like every
      // sampling op here. Scale shape: ONE shuffle on the group key
      // carrying only (doc_id, source) + a 32-char hash — column pruning
      // keeps text out of the exchange; the doc_id tie-break makes the
      // cut exact even on colliding hashes.
      "q71_group_quota",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            col("source"),
            expr("md5(concat('quota:', CAST(doc_id AS STRING)))").as("h"))
          .withColumn(
            "rk",
            row_number()
              .over(Window.partitionBy("source").orderBy(col("h"), col("doc_id")))
              .cast("bigint"))
          .filter(col("rk") <= 10)
          .select("doc_id", "source", "rk"),
      Some(
        "SELECT doc_id, source, rk FROM (" +
          "SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source " +
          "ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk " +
          "FROM documents) t WHERE rk <= 10"),
    ),
    QuerySpec(
      // Token-budget mixture allocation: the "rebalance sources by
      // TOKEN share, not doc share" planning pass of a training-data
      // mixture. Per source: docs, whitespace tokens, and the sampling
      // rate that hits an equal-share budget of 20% of the corpus
      // (budget = 0.2·T/S tokens per source, rate = min(1, budget/
      // tokens)) — scale-free arithmetic, so the gate is meaningful at
      // every sf. Pure map-side-combinable aggregates; the totals join
      // is a broadcast SINGLE row.
      "q101_token_budget",
      (s, dir) => {
        val per = docs(s, dir)
          .select(col("source"), expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
        val tot = per.select(
          sum("n_tokens").cast("double").as("t_tokens"),
          count(lit(1)).cast("double").as("n_sources"))
        per
          .crossJoin(broadcast(tot))
          .select(
            col("source"), col("n_docs"), col("n_tokens"),
            least(
              lit(1.0d),
              (lit(0.2d) * col("t_tokens") / col("n_sources")) / col("n_tokens"))
              .as("sample_rate"))
      },
      Some(
        "WITH per AS (SELECT source, COUNT(*) AS n_docs, " +
          "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens " +
          "FROM documents GROUP BY source), " +
          "tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t_tokens, " +
          "CAST(COUNT(*) AS DOUBLE) AS n_sources FROM per) " +
          "SELECT source, n_docs, n_tokens, " +
          "LEAST(1.0, (0.2 * t_tokens / n_sources) / n_tokens) AS sample_rate " +
          "FROM per CROSS JOIN tot"),
    ),
    QuerySpec(
      // Keep-latest-per-key dedup: one surviving row per user_id, the
      // newest by (ts, event_id) — the CommonCrawl "keep newest capture
      // per URL" shape, and the batch twin of the streaming
      // dropDuplicates path. Scale: ONE shuffle on the key; the window
      // is rank-1-only so AQE + the WindowGroupLimit rewrite push the
      // top-1 filter below the sort (no full per-key materialization).
      // event_id tie-break → deterministic under equal timestamps.
      "q94_keep_latest",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn(
            "rk",
            row_number().over(
              Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("rk") === 1)
          .select("user_id", "event_id", "ts", "event_type", "value"),
      Some(
        "SELECT user_id, event_id, ts, event_type, value FROM (" +
          "SELECT user_id, event_id, ts, event_type, value, " +
          "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk " +
          "FROM events) t WHERE rk = 1"),
    ),
    QuerySpec(
      // Per-source top-fraction quality curation: keep each source's
      // top 20% of documents by q23's quality score — the
      // quality-threshold pass of a FineWeb/Gopher-style pipeline,
      // where the threshold must adapt PER DOMAIN rather than be one
      // global cut. Rank-based (row_number over (quality DESC, doc_id)
      // with the kept count as integer arithmetic, ceil(n/5) =
      // (n+4) div 5) so the cut is SELF-EVIDENTLY exact on both
      // engines. (Correction, r16 review: the double form
      // ceil(n * 0.2) is in fact ALSO exact for this fraction — see
      // the proof at q148, which uses it — so the earlier claim here
      // that it "would round differently when n is a multiple of 5"
      // overclaimed; the integer form stays because its exactness
      // needs no proof.) One shuffle on
      // source; scoring is scan-speed.
      "q111_quality_topfrac",
      (s, dir) => {
        val scored = docs(s, dir)
          .withColumn("n_tokens", expr("size(split(text, ' '))"))
          .withColumn("stop_cnt",
            expr("regexp_count(text, '\\\\b(the|a)\\\\b')"))
          .select(col("source"), col("doc_id"),
            expr("round(least(n_tokens / 100.0D, 1.0D) * 0.5D " +
              "+ least(5.0D * stop_cnt / n_tokens, 1.0D) * 0.5D, 6)").as("quality"))
        val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
        val n = Window.partitionBy("source")
        scored
          .withColumn("rk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(n))
          .filter(col("rk") <= expr("(n + 4) div 5"))
          .select(col("source"), col("doc_id"), col("quality"), col("rk"))
      },
      Some(
        "WITH b AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens, " +
          "len(regexp_extract_all(text, '\\b(the|a)\\b')) AS stop_cnt FROM documents), " +
          "s AS (SELECT doc_id, source, round(least(n_tokens / 100.0, 1.0) * 0.5 " +
          "+ least(5.0 * stop_cnt / n_tokens, 1.0) * 0.5, 6) AS quality FROM b), " +
          "r AS (SELECT source, doc_id, quality, ROW_NUMBER() OVER " +
          "(PARTITION BY source ORDER BY quality DESC, doc_id) AS rk, " +
          "COUNT(*) OVER (PARTITION BY source) AS n FROM s) " +
          "SELECT source, doc_id, quality, rk FROM r WHERE rk <= (n + 4) // 5"),
    ),
    QuerySpec(
      // Length-stratified balanced resample: 10 docs per length decile,
      // chosen by deterministic pseudo-random md5 rank — the
      // curriculum/balance pass that keeps a training mixture from
      // being dominated by one length regime. Decile assignment is
      // INTEGER-exact and sort-free: a length histogram (bounded by
      // distinct lengths, not corpus size) gets an exclusive cumulative
      // count F(len) via a window over that tiny frame, and
      // bucket = (10·F) div n — ties share a bucket, no float boundary
      // can flip membership cross-engine (the q103/q117 boundary
      // lesson), no global sort of the corpus exists anywhere. The
      // per-bucket top-10 runs as the salted two-phase top-k: top-10
      // per (bucket, salt) first — 16-way parallel, bounded state —
      // then top-10 of the ≤160 survivors, which provably equals the
      // direct per-bucket top-10 (each salt's top-10 is a superset of
      // its members in the global top-10). With 10 buckets a direct
      // window would concentrate the corpus on 10 reducers.
      "q124_balanced_resample",
      (s, dir) => {
        // a NULL-text document has no length regime and no fingerprint:
        // it would form a NULL len bin whose histogram POSITION the two
        // engines sort differently (Spark ASC = NULLS FIRST, DuckDB =
        // NULLS LAST), shifting the exclusive cumulative count - and
        // hence the BUCKET - of every real length; its NULL md5 would
        // likewise rank divergently inside the top-k windows. Excluding
        // it is also the correct resample population (r18 NULL-ordering
        // sweep; the oracle filters identically).
        val d = docs(s, dir)
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"), length(col("text")).cast("bigint").as("len"))
        // tiny frame: one row per DISTINCT length — the global-order
        // window runs over hundreds of rows, never the corpus. n_total
        // is the full-frame sum of the SAME histogram (Σ n_l = corpus
        // count), so no second corpus scan and no single-row
        // crossJoin(broadcast(...)) nested-loop shape.
        val wcum = Window.orderBy("len")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy("len")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val buckets = d.groupBy("len").agg(count(lit(1)).as("n_l"))
          .withColumn("cum_incl", sum(col("n_l")).over(wcum))
          .withColumn("n_total", sum(col("n_l")).over(wAll))
          .select(
            col("len"),
            expr("((cum_incl - n_l) * 10) div n_total").as("bucket"))
        val salted = d
          .join(broadcast(buckets), Seq("len"))
          .withColumn("r", md5(col("text")))
          .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)))
        val w1 = Window.partitionBy("bucket", "salt").orderBy(col("r"), col("doc_id"))
        val w2 = Window.partitionBy("bucket").orderBy(col("r"), col("doc_id"))
        salted
          .withColumn("rk1", row_number().over(w1)).filter(col("rk1") <= 10)
          .withColumn("rk", row_number().over(w2)).filter(col("rk") <= 10)
          .select(col("bucket"), col("doc_id"), col("len"))
      },
      Some(
        "WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len " +
          "FROM documents WHERE text IS NOT NULL), " +
          "n AS (SELECT COUNT(*) AS n_total FROM d), " +
          "h AS (SELECT len, COUNT(*) AS n_l FROM d GROUP BY len), " +
          // CAST: DuckDB window SUM promotes to HUGEINT
          "c AS (SELECT len, CAST(SUM(n_l) OVER (ORDER BY len) - n_l AS BIGINT) AS f FROM h), " +
          "b AS (SELECT len, CAST((f * 10) // n_total AS BIGINT) AS bucket FROM c, n), " +
          "j AS (SELECT d.doc_id, d.len, b.bucket, md5(d.text) AS r " +
          "FROM d JOIN b USING (len)), " +
          "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket " +
          "ORDER BY r, doc_id) AS rk FROM j) " +
          "SELECT bucket, doc_id, len FROM rk WHERE rk <= 10"),
    ),
    QuerySpec(
      // Importance sampling: inclusion probability proportional to a
      // per-document weight (here length-derived, the "prefer long
      // documents" mixing knob) with a DETERMINISTIC md5-derived
      // uniform draw — retry-stable and reproducible like every
      // sampling op in this engine, unlike rand(). Pure scan-speed
      // row filter: no shuffle, no state, pushes through any layout.
      "q131_importance_sample",
      (s, dir) =>
        docs(s, dir)
          .withColumn("w", least(lit(1.0d), col("n_chars") / lit(600.0d)))
          .withColumn(
            "u",
            expr(
              "CAST(conv(substr(md5(concat('imp:', CAST(doc_id AS STRING))), 1, 6), 16, 10) AS DOUBLE) " +
                "/ 16777216.0D"))
          .filter(col("u") < col("w"))
          .select(col("doc_id"), col("source"), col("w"), col("u")),
      Some(
        "WITH d AS (SELECT doc_id, source, " +
          "LEAST(1.0, n_chars / 600.0) AS w, " +
          "CAST(('0x' || substr(md5('imp:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT AS DOUBLE) " +
          "/ 16777216.0 AS u FROM documents) " +
          "SELECT doc_id, source, w, u FROM d WHERE u < w"),
    ),
    QuerySpec(
      // Column profiling: per-column null rate / distinct count /
      // min / max / mean over a fact table — the data-quality summary
      // every ingestion job runs before training sees the data. The
      // stack unpivot keeps it ONE scan + ONE combinable groupBy on a
      // 4-value key (vs the union-of-aggregates form, which scans the
      // table once per column); count-distinct shuffles (col, v) pairs
      // only.
      "q133_column_profile",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .select(expr(
            "stack(4, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, " +
              "'l_discount', l_discount, 'l_tax', l_tax) AS (col_name, v)"))
          .groupBy("col_name")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("v")).as("n_nonnull"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).as("vmin"),
            max(col("v")).as("vmax"),
            // DECIMAL-exact mean: a raw double avg differs between
            // Spark's partial-sum tree and DuckDB's sequential fold in
            // the last ULPs (the r9 driver hash mismatch), and
            // round(avg, 6) still flips when the true mean straddles a
            // 6dp boundary (l_discount's does). Summing as DECIMAL is
            // order-independent and exact on both engines; one IEEE
            // division of bit-identical operands is then bit-identical.
            (sum(col("v").cast("decimal(18,6)")).cast("double") / count(col("v")))
              .as("vmean")),
      Some(
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
          s"SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull, " +
            s"COUNT(DISTINCT $c) AS n_distinct, MIN($c) AS vmin, MAX($c) AS vmax, " +
            s"CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE) / COUNT($c) AS vmean FROM lineitem"
        }.mkString(" UNION ALL ")),
    ),
    QuerySpec(
      // Winsorization: clamp a per-document feature to its source's
      // [p05, p95] band — the outlier-clipping normalization a feature
      // pipeline applies before training. The per-source percentile
      // frame is a tiny combinable aggregate broadcast back onto the
      // scan; the clamp itself is scan-speed. Both engines compute the
      // exact linearly-interpolated quantile (Spark `percentile`,
      // DuckDB `quantile_cont`) from the same integers, so the floats
      // agree.
      "q134_winsorize",
      (s, dir) => {
        val st = docs(s, dir).groupBy("source").agg(
          expr("percentile(n_chars, 0.05D)").as("p05"),
          expr("percentile(n_chars, 0.95D)").as("p95"))
        docs(s, dir)
          .join(broadcast(st), Seq("source"))
          .select(
            col("doc_id"), col("source"), col("n_chars"),
            greatest(col("p05"), least(col("p95"), col("n_chars").cast("double")))
              .as("clipped"))
      },
      Some(
        "WITH st AS (SELECT source, quantile_cont(n_chars, 0.05) AS p05, " +
          "quantile_cont(n_chars, 0.95) AS p95 FROM documents GROUP BY source) " +
          "SELECT d.doc_id, d.source, d.n_chars, " +
          "GREATEST(st.p05, LEAST(st.p95, CAST(d.n_chars AS DOUBLE))) AS clipped " +
          "FROM documents d JOIN st USING (source)"),
    ),
    QuerySpec(
      // Temperature-based mixture allocation (the mT5/multilingual
      // α-sampling rule): per-source sampling probability ∝ p^α with
      // α = 0.3, flattening the source distribution so low-resource
      // sources are upweighted; rate hits a 50%-of-corpus token
      // budget. All corpus-wide scalars derive from full-frame window
      // sums over the TINY per-source frame (q124's pattern — no
      // single-row cross join), so the only real shuffle is the
      // token-count groupBy.
      "q136_temperature_mixture",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val full = Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        docs(s, dir)
          .select(col("source"), expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tok"))
          .groupBy("source").agg(sum("tok").as("n_tokens"))
          .withColumn("t_tokens", sum(col("n_tokens")).over(full).cast("double"))
          .withColumn("p", col("n_tokens") / col("t_tokens"))
          .withColumn("pa", pow(col("p"), lit(0.3d)))
          .withColumn("q", col("pa") / sum(col("pa")).over(full))
          .select(
            col("source"), col("n_tokens"), col("p"), col("q"),
            least(lit(1.0d), col("q") * lit(0.5d) * col("t_tokens") / col("n_tokens"))
              .as("rate"))
      },
      Some(
        "WITH per AS (SELECT source, " +
          "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens " +
          "FROM documents GROUP BY source), " +
          "t AS (SELECT *, CAST(SUM(n_tokens) OVER () AS DOUBLE) AS t_tokens FROM per), " +
          "p1 AS (SELECT *, n_tokens / t_tokens AS p, " +
          "POW(n_tokens / t_tokens, 0.3) AS pa FROM t), " +
          "p2 AS (SELECT *, SUM(pa) OVER () AS sum_pa FROM p1) " +
          "SELECT source, n_tokens, p, pa / sum_pa AS q, " +
          "LEAST(1.0, (pa / sum_pa) * 0.5 * t_tokens / n_tokens) AS rate FROM p2"),
    ),
    QuerySpec(
      // Boilerplate stripping with reconstruction (the C4/RefinedWeb
      // "remove lines shared across many pages" pass): 4-token
      // segments whose document frequency ≥ 5 are removed from EVERY
      // document (q125 keeps the first occurrence; boilerplate has no
      // rightful owner), then each document reassembles in segment
      // order. Scale: segment df is one combinable groupBy; the
      // common-segment set is tiny by construction (df threshold) so
      // the strip is a broadcast anti-join; reconstruction is the q125
      // ordered array fold — no window over the corpus.
      "q137_boilerplate_strip",
      (s, dir) => {
        val segs = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(
            col("doc_id"),
            explode(expr(
              "transform(sequence(0, CAST(ceil(size(toks) / 4.0) AS INT) - 1), " +
                "i -> struct(CAST(i AS BIGINT) AS idx, " +
                "concat_ws(' ', slice(toks, i * 4 + 1, 4)) AS seg))")).as("x"))
          .select(col("doc_id"), col("x.idx").as("idx"), col("x.seg").as("seg"))
          .localCheckpoint() // feeds df, the strip, and totals
        val common = segs.groupBy("seg")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= 5)
          .select(col("seg"))
        val kept = segs.join(broadcast(common), Seq("seg"), "left_anti")
        val perDoc = kept.groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_kept"),
            expr("array_join(transform(array_sort(collect_list(struct(idx, seg))), " +
              "x -> x.seg), ' ')").as("clean_text"))
        segs.groupBy("doc_id").agg(count(lit(1)).as("n_segs"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_segs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("clean_text"), lit("")).as("clean_text"))
      },
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
          "s AS (SELECT doc_id, CAST(i AS BIGINT) AS idx, " +
          "array_to_string(toks[(i*4+1):(i*4+4)], ' ') AS seg " +
          "FROM t, unnest(range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT))) AS u(i)), " +
          "c AS (SELECT seg FROM s GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 5), " +
          "k AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept, " +
          "string_agg(seg, ' ' ORDER BY idx) AS clean_text " +
          "FROM s ANTI JOIN c USING (seg) GROUP BY doc_id), " +
          "tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs FROM s GROUP BY doc_id) " +
          "SELECT tot.doc_id, n_segs, COALESCE(n_kept, 0) AS n_kept, " +
          "COALESCE(clean_text, '') AS clean_text " +
          "FROM tot LEFT JOIN k ON tot.doc_id = k.doc_id"),
    ),
    QuerySpec(
      // Stratified sampling with EXACT per-stratum counts — q44's
      // hash-threshold split only hits the target fraction in
      // expectation; when the contract is "exactly ceil(20%) of every
      // (lang, source) stratum" (balanced eval sets, per-language
      // quotas), rank the stratum by a salted md5 and keep the first
      // ceil(0.2·|stratum|). Deterministic (md5 order, doc_id
      // tiebreak), and exact by construction. The ceil(n * 0.2)
      // boundary is exact on both engines despite the IEEE double
      // (r16 review, resolving q111's earlier divergence claim):
      // DuckDB computes n·0.2 in DECIMAL (exact); Spark's double
      // product provably rounds to the same ceil, because
      // (double)0.2 = 0.2·(1 + 2⁻⁵⁴), so for n = 5m the true product
      // m·(1 + 2⁻⁵⁴) carries an excess m·2⁻⁵⁴ STRICTLY below the
      // half-ulp 2^(e−53) for every m < 2^(e+1) — round-to-nearest
      // lands on m exactly for all m < 2^53 (probed empirically too:
      // zero divergences to 2e7 and at all 5m near powers of two up
      // to 2^50); non-multiples of 5 sit ≥ 1/5 from the boundary.
      // Scale shape: one shuffle
      // by stratum key for the rank window; the per-stratum counts
      // frame is strata-sized and broadcast back. Skewed strata
      // parallelize no worse than any rank-per-group — and the rank
      // window carries a WindowGroupLimit-free full pass only because
      // the limit is data-dependent (ceil of the joined count), which
      // is the price of exactness over q44's scan-only split.
      "q148_stratified_sample",
      (s, dir) => {
        val d = docs(s, dir).select(
          col("doc_id"), col("lang"), col("source"),
          expr("md5(concat('strat:', CAST(doc_id AS STRING)))").as("h"))
        val counts = d.groupBy("lang", "source").agg(count(lit(1)).as("n_stratum"))
        val w = Window.partitionBy("lang", "source")
          .orderBy(col("h").asc, col("doc_id").asc)
        d.withColumn("rn", row_number().over(w))
          .join(broadcast(counts), Seq("lang", "source"))
          .filter(col("rn") <= ceil(col("n_stratum") * 0.2d))
          .select(
            col("doc_id"), col("lang"), col("source"),
            col("rn").cast("bigint").as("rn"), col("n_stratum"))
      },
      Some(
        "WITH d AS (SELECT doc_id, lang, source, " +
          "md5('strat:' || CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
          "r AS (SELECT doc_id, lang, source, " +
          "row_number() OVER (PARTITION BY lang, source ORDER BY h ASC, doc_id ASC) AS rn, " +
          "COUNT(*) OVER (PARTITION BY lang, source) AS n_stratum FROM d) " +
          "SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS rn, n_stratum " +
          "FROM r WHERE rn <= ceil(n_stratum * 0.2)"),
    ),
    QuerySpec(
      // k-anonymity generalization — privacy-preserving curation before
      // a dataset leaves the pipeline: every row's quasi-identifier
      // tuple (nation, segment) must be shared by ≥ k rows. The
      // generalization ladder is per-ROW minimal: keep (nation,
      // segment) if that group has ≥ k members, else suppress nation
      // ('*', segment), else suppress both. Group sizes at both ladder
      // levels come from two combinable groupBys whose results are
      // dimension-sized (≤ nations×segments rows) and broadcast back —
      // the corpus is scanned once and never shuffled on a row key, so
      // the op runs at scan speed at 100 TB. Level counts are exact
      // integers; the CASE cuts are integer comparisons — no float
      // boundary can flip a row cross-engine.
      "q152_k_anonymity",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
        val g0 = c.groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n0"))
        // The level-1 group a row would PUBLISH into is ('*', segment),
        // which contains only the rows from sub-k strata of that
        // segment — so the k test must count THOSE rows (m1), not the
        // whole segment: a segment can be huge while its small-strata
        // remainder is still < k.
        val m1 = g0.filter(col("n0") < 10)
          .groupBy("c_mktsegment").agg(sum(col("n0")).as("m1"))
        c.join(broadcast(g0), Seq("c_nationkey", "c_mktsegment"))
          .join(broadcast(m1), Seq("c_mktsegment"), "left")
          .select(
            col("c_custkey"),
            expr("CAST(CASE WHEN n0 >= 10 THEN 0 WHEN m1 >= 10 THEN 1 ELSE 2 END AS BIGINT)")
              .as("gen_level"),
            expr("CASE WHEN n0 >= 10 THEN CAST(c_nationkey AS STRING) ELSE '*' END")
              .as("gen_nation"),
            expr("CASE WHEN n0 >= 10 OR m1 >= 10 THEN c_mktsegment ELSE '*' END")
              .as("gen_segment"),
            expr("CAST(CASE WHEN n0 >= 10 THEN n0 WHEN m1 >= 10 THEN m1 ELSE NULL END AS BIGINT)")
              .as("group_n"))
      },
      Some(
        "WITH g0 AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n0 " +
          "FROM customer GROUP BY 1, 2), " +
          "m1 AS (SELECT c_mktsegment, SUM(n0) AS m1 FROM g0 WHERE n0 < 10 GROUP BY 1) " +
          "SELECT c_custkey, " +
          "CAST(CASE WHEN n0 >= 10 THEN 0 WHEN m1 >= 10 THEN 1 ELSE 2 END AS BIGINT) AS gen_level, " +
          "CASE WHEN n0 >= 10 THEN CAST(c_nationkey AS VARCHAR) ELSE '*' END AS gen_nation, " +
          "CASE WHEN n0 >= 10 OR m1 >= 10 THEN c_mktsegment ELSE '*' END AS gen_segment, " +
          "CAST(CASE WHEN n0 >= 10 THEN n0 WHEN m1 >= 10 THEN m1 ELSE NULL END AS BIGINT) AS group_n " +
          "FROM customer JOIN g0 USING (c_nationkey, c_mktsegment) " +
          "LEFT JOIN m1 USING (c_mktsegment)"),
    ),
    QuerySpec(
      // Deterministic weighted sampling without replacement
      // (Efraimidis–Spirakis A-ES): each doc draws u ∈ (0,1) from the
      // md5 of its key (reproducible — no RNG state, exactly the q44
      // split discipline) and the top-k by key u^(1/w), weight = doc
      // length, is the weighted sample. One pass, no corpus sort:
      // Spark executes orderBy+limit as TakeOrderedAndProject
      // (per-partition top-k heaps, merge at the driver) — the shape
      // that picks 20 of 10¹¹ docs without shuffling the corpus. The
      // oracle re-derives the same keys in DuckDB and must select the
      // identical 20 docs.
      "q163_weighted_sample",
      (s, dir) =>
        docs(s, dir)
          .withColumn("u",
            expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
              / lit(1152921504606846976.0)) // 2^60
          // zero-weight guard lives in the shared esKey (NULL key →
          // ranked last, never sampled, identically on both engines)
          .withColumn("es_key", esKey(col("u"), col("n_chars")))
          .orderBy(col("es_key").desc, col("doc_id").asc)
          .limit(20)
          .select(col("doc_id"), col("n_chars"), round(col("es_key"), 9).as("es_key")),
      Some(
        "WITH k AS (SELECT doc_id, n_chars, " +
          "pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT " +
          "/ 1152921504606846976.0), 1.0 / n_chars) AS es_key FROM documents) " +
          "SELECT doc_id, n_chars, round(es_key, 9) AS es_key FROM k " +
          "ORDER BY es_key DESC, doc_id ASC LIMIT 20"),
    ),
    QuerySpec(
      // Cross-source score calibration — before mixing sources by a
      // quality cut, put their scores on a common scale: each doc gets
      // its WITHIN-SOURCE percentile (explicit (rk−1)/max(n−1,1) —
      // pinned identically on both engines, including the 1-doc
      // source edge) and its GLOBAL CDF position. The global CDF is
      // the scale-path formulation: cumulative counts over the
      // DISTINCT-lengths frame (lengths-sized window), joined back by
      // length — the corpus itself is never globally sorted, unlike a
      // naive global percent_rank. Per-source windows partition-
      // parallelize; ties break on doc_id so ranks are deterministic.
      "q173_score_calibration",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // a NULL n_chars has no rank: it would sit at OPPOSITE ends of
        // the two engines' ASC orderings (Spark NULLS FIRST, DuckDB
        // NULLS LAST), shifting every row_number - hence every pct_src
        // and the global CDF - in its source. A doc with no measured
        // length cannot be calibrated; the oracle filters identically
        // (r18 NULL-ordering sweep, the q179 population rule).
        val d = docs(s, dir)
          .filter(col("n_chars").isNotNull)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val wSrc = W.partitionBy("source")
          .orderBy(col("n_chars").asc, col("doc_id").asc)
        val ranked = d
          .withColumn("rk", row_number().over(wSrc))
          .withColumn("cnt", count(lit(1)).over(W.partitionBy("source")))
          .withColumn("pct_src",
            round((col("rk") - 1) / greatest(col("cnt") - 1, lit(1)).cast("double"), 6))
        val lens = d.groupBy("n_chars").agg(count(lit(1)).as("ln"))
          .withColumn("cum", sum(col("ln")).over(
            W.orderBy(col("n_chars").asc)
              .rowsBetween(W.unboundedPreceding, W.currentRow)))
          .withColumn("cdf_global",
            round(col("cum") / sum(col("ln")).over(W.partitionBy()).cast("double"), 6))
          .select(col("n_chars"), col("cdf_global"))
        ranked.join(lens, Seq("n_chars"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("pct_src"), col("cdf_global"))
      },
      Some(
        "WITH d AS (SELECT doc_id, source, n_chars FROM documents " +
          "WHERE n_chars IS NOT NULL), " +
          "r AS (SELECT doc_id, source, n_chars, " +
          "row_number() OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) AS rk, " +
          "COUNT(*) OVER (PARTITION BY source) AS cnt FROM d), " +
          "lens AS (SELECT n_chars, COUNT(*) AS ln FROM d GROUP BY 1), " +
          "c AS (SELECT n_chars, round(SUM(ln) OVER (ORDER BY n_chars ASC " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "/ CAST(SUM(ln) OVER () AS DOUBLE), 6) AS cdf_global FROM lens) " +
          "SELECT doc_id, source, r.n_chars, " +
          "round((rk - 1) / CAST(greatest(cnt - 1, 1) AS DOUBLE), 6) AS pct_src, " +
          "cdf_global FROM r JOIN c ON r.n_chars = c.n_chars"),
    ),
    QuerySpec(
      // URL decomposition — the domain-level curation primitive (crawl
      // pipelines count, cap, and blocklist by host/registrable
      // domain, never by raw URL). URLs are synthesized
      // deterministically from doc fields, then decomposed with
      // Spark's NATIVE parse_url (HOST / PATH / keyed QUERY) plus a
      // site-level substring_index label cut; the oracle re-derives
      // every component from the construction, so the gate is
      // parse_url's extraction semantics. Zero shuffles — the whole
      // thing is scan-stage string expressions; the per-host rollup
      // rides one combinable groupBy.
      "q174_url_parse",
      (s, dir) => {
        val d = docs(s, dir)
          .withColumn("url", concat(
            lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string"),
            lit("?ref=r"), pmod(col("doc_id"), lit(7)).cast("string")))
          .select(col("doc_id"),
            expr("parse_url(url, 'HOST')").as("host"),
            expr("parse_url(url, 'PATH')").as("path"),
            expr("parse_url(url, 'QUERY', 'ref')").as("ref"))
          .withColumn("domain", expr("substring_index(host, '.', 2)"))
        d.groupBy("host", "domain", "ref")
          .agg(count(lit(1)).as("n_docs"), min(col("path")).as("first_path"))
      },
      Some(
        "WITH d AS (SELECT doc_id, source || '.example.com' AS host, " +
          "source || '.example' AS domain, " +
          "'/docs/' || CAST(doc_id AS VARCHAR) AS path, " +
          "'r' || CAST(doc_id % 7 AS VARCHAR) AS ref FROM documents) " +
          "SELECT host, domain, ref, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
          "MIN(path) AS first_path FROM d GROUP BY 1, 2, 3"),
    ),
    QuerySpec(
      // Per-source quantile normalization — make quality scores
      // comparable ACROSS sources before q45's mixture sampling:
      // a raw score cut keeps the verbose source's junk and drops the
      // terse source's gems; rank-normalizing within source first
      // makes one global threshold mean the same thing everywhere.
      // ONE source-partitioned window (deterministic (score, doc_id)
      // ordering makes ranks unique, so percent_rank is the same
      // exact rational on both engines — no tie ambiguity), then the
      // decile from integer-exact floor arithmetic. Source partitions
      // shard the window at scale; no global pass anywhere.
      "q187_quantile_normalize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val win = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        Tables(s, dir, "documents")
          // a NULL n_chars would rank at OPPOSITE ends per engine
          // (Spark ASC NULLS FIRST, DuckDB NULLS LAST), shifting every
          // percent_rank in its source; an unmeasured doc cannot be
          // rank-normalized - the oracle filters identically (r18
          // NULL-ordering sweep, the q179 population rule)
          .filter(col("n_chars").isNotNull)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("pr", percent_rank().over(win))
          .withColumn("decile", least(floor(col("pr") * 10), lit(9L)).cast("long"))
          .withColumn("pr", round(col("pr"), 6))
      },
      Some(
        "SELECT doc_id, source, n_chars, " +
          "round(PERCENT_RANK() OVER (PARTITION BY source ORDER BY n_chars, doc_id), 6) AS pr, " +
          "CAST(LEAST(FLOOR(PERCENT_RANK() OVER (PARTITION BY source ORDER BY n_chars, doc_id) " +
          "* 10), 9) AS BIGINT) AS decile " +
          "FROM documents WHERE n_chars IS NOT NULL"),
    ),
    QuerySpec(
      // l-diversity — the check k-anonymity (q152) misses: a cell can
      // hold ≥k rows that all share ONE sensitive value, so membership
      // still leaks the attribute. Per quasi-identifier cell
      // (nation × account-balance band): row count, distinct sensitive
      // values (market segment), and the l≥3 verdict. Computed as two
      // stacked combinable groupBys (cell+segment counts, then cell
      // rollup) — the exact-distinct-without-a-distinct shape that
      // survives any scale.
      "q188_l_diversity",
      (s, dir) => {
        val cells = Tables(s, dir, "customer")
          .select(col("c_nationkey"),
            floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"),
            col("c_mktsegment"))
          .groupBy("c_nationkey", "bal_band", "c_mktsegment")
          .agg(count(lit(1)).as("n_seg"))
        cells.groupBy("c_nationkey", "bal_band")
          .agg(
            sum(col("n_seg")).as("n"),
            count(lit(1)).as("l_distinct"))
          .withColumn("diverse", col("l_distinct") >= 3)
      },
      Some(
        "WITH cells AS (SELECT c_nationkey, " +
          "CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band, c_mktsegment, " +
          "CAST(COUNT(*) AS BIGINT) AS n_seg FROM customer GROUP BY 1, 2, 3) " +
          "SELECT c_nationkey, bal_band, CAST(SUM(n_seg) AS BIGINT) AS n, " +
          "CAST(COUNT(*) AS BIGINT) AS l_distinct, COUNT(*) >= 3 AS diverse " +
          "FROM cells GROUP BY 1, 2"),
    ),
    QuerySpec(
      // Right-to-erasure cascade audit — given a forget-set of
      // customers, size the deletion across every table it touches,
      // INCLUDING the 2-hop fact cascade (customer → orders →
      // lineitem). Hop 1 semi-joins against the forget-set, which is
      // request-batch-sized by construction — that hint is safe. Hop
      // 2's affected-orders frame scales with forget-set × orders-per-
      // customer, i.e. it is fact-proportional at this fixture's 1/97
      // density, so it carries NO forced hint (a hint is honored
      // unconditionally — the q192/q208 defect class); the planner +
      // AQE broadcast it exactly when a real request batch makes it
      // small. Counts fold per table and union into the deletion
      // manifest a compliance job would execute. The forget-set is
      // deterministic (custkey ≡ 0 mod 97) so the gate pins exact
      // counts.
      "q198_deletion_cascade",
      (s, dir) => {
        val forget = Tables(s, dir, "customer")
          .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
        val orders = Tables(s, dir, "orders")
          .join(broadcast(forget), col("o_custkey") === col("c_custkey"), "left_semi")
          .select(col("o_orderkey"))
          .localCheckpoint(true)
        val li = Tables(s, dir, "lineitem")
          .join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        forget.agg(count(lit(1)).as("n_delete")).select(lit("customer").as("table"), col("n_delete"))
          .unionByName(orders.agg(count(lit(1)).as("n_delete"))
            .select(lit("orders").as("table"), col("n_delete")))
          .unionByName(li.agg(count(lit(1)).as("n_delete"))
            .select(lit("lineitem").as("table"), col("n_delete")))
      },
      Some(
        "SELECT 'customer' AS \"table\", CAST(COUNT(*) AS BIGINT) AS n_delete " +
          "FROM customer WHERE c_custkey % 97 = 0 " +
          "UNION ALL SELECT 'orders', COUNT(*) FROM orders " +
          "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0) " +
          "UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem WHERE l_orderkey IN " +
          "(SELECT o_orderkey FROM orders WHERE o_custkey IN " +
          "(SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0))"),
    ),
    QuerySpec(
      // Idempotent-ingest ledger — the exactly-once file manifest an
      // incremental loader keeps: an arriving batch diffs against the
      // ledger of already-ingested files by (id, content checksum):
      // unseen id → ingest; seen id, same checksum → skip (the replay
      // case); seen id, different checksum → re-ingest (the
      // changed-file case). One broadcast full-outer join on the
      // metadata-sized manifests (never the file bytes), decision
      // row-local, counts fold per decision. Batch/ledger/mutation
      // are deterministic doc_id arithmetic so every class is
      // populated and exactly pinned.
      "q199_ingest_ledger",
      (s, dir) => {
        val files = Tables(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("checksum"))
        val ledger = files.filter(col("doc_id") % 3 =!= 0)
          .withColumn("checksum",
            // every 5th ledger entry simulates a since-modified file
            when(col("doc_id") % 5 === 0, lit("stale")).otherwise(col("checksum")))
          .select(col("doc_id").as("l_id"), col("checksum").as("l_sum"))
        val batch = files.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id").as("b_id"), col("checksum").as("b_sum"))
        batch.join(ledger, col("b_id") === col("l_id"), "left")
          .select(
            when(col("l_id").isNull, "ingest_new")
              .when(col("l_sum") === col("b_sum"), "skip_replay")
              .otherwise("reingest_changed").as("decision"))
          .groupBy("decision").agg(count(lit(1)).as("n_files"))
      },
      Some(
        "WITH files AS (SELECT doc_id, md5(text) AS checksum FROM documents), " +
          "ledger AS (SELECT doc_id AS l_id, CASE WHEN doc_id % 5 = 0 THEN 'stale' " +
          "ELSE checksum END AS l_sum FROM files WHERE doc_id % 3 != 0), " +
          "batch AS (SELECT doc_id AS b_id, checksum AS b_sum FROM files WHERE doc_id % 2 = 0) " +
          "SELECT CASE WHEN l_id IS NULL THEN 'ingest_new' " +
          "WHEN l_sum = b_sum THEN 'skip_replay' ELSE 'reingest_changed' END AS decision, " +
          "CAST(COUNT(*) AS BIGINT) AS n_files " +
          "FROM batch LEFT JOIN ledger ON b_id = l_id GROUP BY 1"),
    ),
    QuerySpec(
      // The corpus funnel report — the headline table of every
      // curation run, and the proof the stages COMPOSE as one lazy
      // plan: quality screen (q23's ratios) → exact-dedup keeper on
      // normalized text (q50's normalization + q25's min-id rule,
      // scoped to quality survivors) → per-source mixture cap (q45's
      // deterministic md5 bucket). Stages become boolean columns, so
      // the whole funnel is ONE scan + one md5-partitioned window +
      // one per-source fold — per-stage doc and token counts, nothing
      // re-scanned, monotonicity by construction (each flag ANDs the
      // previous). At 100 TB this exact shape runs as written: the
      // window's md5 groups are duplicate-sized, the rollup 20-keyed.
      "q200_curation_funnel",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // the fixture has no exact duplicates at small SF, which would
        // leave the dedup stage vacuously pass-through — so 1-in-10
        // docs re-enters as a deterministic case/whitespace-mangled
        // replica (q46's derive-the-feature pattern); normalization
        // must collapse replica onto original and the min-id keeper
        // must keep the original
        val base = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
        val replicas = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("source"),
            concat(upper(col("text")), lit(" ")).as("text"))
        val d = base.unionByName(replicas)
          .withColumn("n_chars", length(col("text")).cast("long"))
          .withColumn("n_tok", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
          // empty-text guard lives in the shared digitRatio (NULL
          // ratio → q_ok = false, identically on both engines)
          .withColumn("digit_ratio", digitRatio)
          .withColumn("q_ok",
            col("n_chars").between(60, 5000) && col("digit_ratio") < 0.3)
          .withColumn("norm", expr("md5(trim(regexp_replace(lower(text), '\\\\s+', ' ')))"))
        val wd = Window.partitionBy("norm")
        val flagged = d
          .withColumn("keeper",
            col("q_ok") &&
              col("doc_id") === min(when(col("q_ok"), col("doc_id"))).over(wd))
          .withColumn("sampled",
            col("keeper") && expr(hashBucket("funnel:", "CAST(doc_id AS STRING)")) < 60)
        flagged.groupBy("source").agg(
          count(lit(1)).as("n_in"),
          sum(when(col("q_ok"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("keeper"), 1L).otherwise(0L)).as("n_dedup"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("sampled"), col("n_tok")).otherwise(0L)).as("tokens_out"))
      },
      Some(
        "WITH corpus AS (SELECT doc_id, source, text FROM documents " +
          "UNION ALL SELECT doc_id + 1000000, source, upper(text) || ' ' " +
          "FROM documents WHERE doc_id % 10 = 0), " +
          "d AS (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, " +
          "len(regexp_extract_all(text, '[0-9]')) / CAST(length(text) AS DOUBLE) AS digit_ratio, " +
          "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm FROM corpus), " +
          "f AS (SELECT *, (n_chars BETWEEN 60 AND 5000) AND digit_ratio < 0.3 AS q_ok FROM d), " +
          "k AS (SELECT *, q_ok AND doc_id = MIN(CASE WHEN q_ok THEN doc_id END) " +
          "OVER (PARTITION BY norm) AS keeper FROM f), " +
          "sm AS (SELECT *, keeper AND " +
          s"${duckBucket("funnel:", "CAST(doc_id AS VARCHAR)")} < 60 AS sampled FROM k) " +
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_in, " +
          "CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality, " +
          "CAST(SUM(CASE WHEN keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup, " +
          "CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled, " +
          "CAST(SUM(CASE WHEN sampled THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_out " +
          "FROM sm GROUP BY 1"),
    ),
  )
}

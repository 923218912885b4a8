package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`: exact (hash-groupBy),
  * n-gram Jaccard near-dup, MinHash+LSH, SimHash.
  *
  * Cross-engine determinism: every hash derives from md5 (identical in
  * Spark and DuckDB) via hex-prefix → integer; MinHash permutations are
  * fixed (a*h+b) mod p with hardcoded coefficients, all arithmetic
  * staying well inside int64.
  *
  * Scale notes:
  *  - exact dedup = hash aggregate on the fingerprint → one shuffle on
  *    a well-distributed key; at 100 TB this is the canonical map-side
  *    combinable groupBy.
  *  - MinHash/LSH: cost is O(docs × shingles × k) map work plus a
  *    self-join on (band, signature) — the join key is a tiny signature
  *    string, so the shuffle moves signatures, not documents. Candidate
  *    verification happens on the candidate pairs only (LSH's point).
  *  - naive all-pairs Jaccard is intentionally bounded (doc_id < 60):
  *    it exists as the correctness oracle for the LSH path, not the
  *    scale path.
  */
object DedupOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Spread doc rows before a shingle/gram fan-out ONLY when the
    * source scan is drastically under-partitioned (r21, guide §2.4/§2.5
    * — VERDICT r20 #3). The r20 shape repartitioned unconditionally by
    * bare `doc_id`: that exchange is REPARTITION_BY_COL, which AQE's
    * coalescing happily shrinks to 1-2 partitions on the KB-sized
    * doc-row stream, serializing the 30-200× explode + md5 work it was
    * supposed to parallelize — measured +11-31% on
    * q27/q29x/q93/q112/q127/q128/q175 at the bench SF (multi8,
    * interleaved warm reps, r21). On any real layout the scan already
    * has ≥ cores tasks and the exchange is pure overhead; ONLY the
    * single-row-group fixture (1-task scan) needs it, and there it is
    * worth 25-35% (q29b 2.38→1.65 s, q93 1.69→1.12, q112 1.26→0.84,
    * single-file warm reps). So: spread iff the scan has fewer than
    * cores/8 partitions, to an explicit (AQE-exempt,
    * REPARTITION_BY_NUM) defaultParallelism partition count — scale-
    * adaptive via the session's core count, never a local constant.
    * Streaming frames pass through untouched (.rdd is illegal there;
    * the streaming signature path uses withRowwiseBands directly).
    */
  private def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val n = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions * 8 <= n) df.repartition(n, col("doc_id")) else df
    }
  }

  /** Distinct word 3-gram shingles per (doc_id, text) frame row.
    *
    * PRECONDITION (ADVICE r20): `base` must have unique doc_id rows —
    * per-doc dedup happens IN the row (array_distinct before the
    * explode), which is equivalent to the post-explode `.distinct()`
    * it replaced (r20, guide §2.4) only because (doc_id, sh) cannot
    * collide across rows. All callers pass per-doc frames; a frame
    * with duplicate doc_id rows would inflate downstream df counts.
    * The removed distinct shuffled the ~30× shingle stream; [[spread]]
    * keeps the fan-out parallel when (and only when) the source scan
    * under-partitions.
    */
  private def shinglesFrom(base: DataFrame): DataFrame =
    base
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .transform(spread)
      .select(
        col("doc_id"),
        explode(expr("array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3))))"))
          .as("sh"))

  /** Distinct word 3-gram shingles per document (doc_id, sh). */
  private def shingles(s: SparkSession, dir: String, maxDocId: Option[Long]): DataFrame =
    shinglesFrom(maxDocId.fold(docs(s, dir))(m => docs(s, dir).filter(col("doc_id") < m)))

  private val shinglesSqlAll: String =
    "t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents " +
      "WHERE len(string_split(text,' ')) >= 3), " +
      "s AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2],' ') AS sh " +
      "FROM t, unnest(range(1, len(toks)-1)) AS u(i))"

  /** Stop-shingle suppression for the signature paths: drop shingles
    * present in more than half the corpus. Shared boilerplate (headers,
    * license preambles, navigation chrome) otherwise dominates every
    * document's signature and collapses LSH buckets toward one giant
    * bucket — candidate generation degrades to all-pairs exactly when
    * the corpus is large enough for that to be fatal. Doc-frequency is
    * one map-side-combinable groupBy on the shingle; the frequent set
    * is tiny by construction (df > 50%) so the anti-join broadcasts.
    *
    * The exact-Jaccard oracle (q26) stays on RAW shingles: it defines
    * similarity; this is a signature-quality filter.
    */
  private def contentShingles(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir, None).localCheckpoint()
    sh.join(broadcast(frequentShingles(s, dir, sh)), Seq("sh"), "left_anti")
  }

  /** Shingles with df > 50% of the given corpus frame — the stop set. */
  private def frequentShinglesFrom(frame: DataFrame, sh: DataFrame): DataFrame = {
    val nDocs = frame.select(count(lit(1)).as("n_docs"))
    sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") > col("n_docs") * 0.5D)
      .select("sh")
  }

  /** Shingles with df > 50% of the corpus — the stop set itself. */
  private def frequentShingles(s: SparkSession, dir: String, sh: DataFrame): DataFrame =
    frequentShinglesFrom(docs(s, dir), sh)

  /** The stop-shingle set of an arbitrary (doc_id, text) frame, folded
    * to a SINGLE row (`stop_arr` ARRAY<STRING>). Tiny by construction.
    * PRECONDITION: unique doc_id rows (see [[shinglesFrom]] — duplicate
    * doc_ids would inflate the df counts the 50% threshold reads).
    */
  def stopShingleRowFrom(frame: DataFrame): DataFrame =
    frequentShinglesFrom(frame, shinglesFrom(frame))
      .agg(collect_list(col("sh")).as("stop_arr"))

  /** The corpus stop-shingle set folded to a SINGLE row (`stop_arr`
    * ARRAY<STRING>) — the static artifact the row-wise signature path
    * broadcasts. Tiny by construction (df > 50%).
    */
  def stopShingleRow(s: SparkSession, dir: String): DataFrame =
    stopShingleRowFrom(docs(s, dir))

  /** shinglesSqlAll + the same df > 50% stop-shingle filter (CTE `s2`). */
  private val contentShinglesSql: String =
    s"$shinglesSqlAll, " +
      "s2 AS (SELECT doc_id, sh FROM s WHERE sh IN " +
      "(SELECT sh FROM s GROUP BY sh " +
      "HAVING COUNT(*) <= 0.5 * (SELECT COUNT(*) FROM documents)))"

  private val shinglesSqlBounded: String =
    "t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents " +
      "WHERE doc_id < 60 AND len(string_split(text,' ')) >= 3), " +
      "s AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2],' ') AS sh " +
      "FROM t, unnest(range(1, len(toks)-1)) AS u(i))"

  // 16 fixed MinHash permutations (a*h + b) mod p, p = 2^31-1. h < 2^28
  // (7 hex chars of md5), a < 2^15 → products < 2^43, no overflow.
  // Single source of truth lives with the native expression (the
  // compiled kernel and these SQL oracles must never drift).
  private val minhashPerms: Seq[(Int, Int, Int)] = graft.functions.MinhashMins.perms
  private val P = graft.functions.MinhashMins.P

  /** (doc_id, simhash) — 32-bit SimHash over stop-filtered word 3-gram
    * shingles. Signature fold = ONE map-side-combinable aggregation
    * with a 32-counter buffer ([[graft.functions.SimhashAggs]]) — the
    * explode-per-bit form (kept as the DuckDB oracle) would shuffle
    * 32× the shingle stream through two aggregations.
    */
  private def simhashSig(s: SparkSession, dir: String): DataFrame = {
    val simhash32 = udaf(graft.functions.SimhashAggs.Simhash32Agg)
    contentShingles(s, dir)
      .withColumn("h32", expr("CAST(conv(substr(md5(sh), 1, 8), 16, 10) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(simhash32(col("h32")).as("simhash"))
  }

  private val simhashSqlCtes: String =
    s"$contentShinglesSql, " +
      "h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h32 FROM s2), " +
      "bits AS (SELECT doc_id, j, SUM(2 * ((h32 >> j) & 1) - 1) AS bal " +
      "FROM h, unnest(range(0, 32)) AS u(j) GROUP BY 1, 2), " +
      // CAST: DuckDB promotes integer SUM to HUGEINT → the driver hashes
      // the column as float64 while Spark emits int64; cast back to BIGINT
      "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN bal > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash " +
      "FROM bits GROUP BY doc_id)"

  /** (doc_id, band, sig) — 8 MinHash LSH bands of 2 permutations each,
    * computed by the native `minhash_mins` kernel: the whole signature
    * fold (shingle → dedup → stop-filter → md5 → 16 minima) happens
    * inside the document scan, so the only shuffle left in signature
    * building is the stop-set pass — the grouped fold it replaced
    * shuffled the exploded shingle stream (≈30× the document stream)
    * through distinct + min-agg. Measured honestly (BASELINE.md
    * round-9): locally the two are PAR (the shuffles it removes are
    * CPU-cheap in one JVM, and on the single-row-group fixture the
    * in-scan fold serializes into the 1-task scan, costing q128
    * ~0.5 s); the kernel wins on multi-file layouts where the scan
    * parallelizes at the source (q129 1.50 → 1.10 s) and is the right
    * shape at 100 TB, where the removed corpus-sized shuffles are
    * network/disk-bound, not CPU-bound. Semantics gated three ways:
    * the q27/q127/q128/q129 DuckDB oracles, and
    * [[minhashBandsGrouped]] kept as a test-only second witness
    * (MinhashMinsSpec). Public so the bucket-bound spec can histogram
    * the REAL band stream.
    */
  def minhashBands(s: SparkSession, dir: String): DataFrame =
    bandsFrom(docs(s, dir))

  /** [[minhashBands]] over an arbitrary (doc_id, text) frame — its own
    * stop set, its own signatures.
    */
  private def bandsFrom(frame: DataFrame): DataFrame =
    withRowwiseBands(
      frame
        // the kernel folds ~30× shingles per doc IN the scan stage —
        // don't let that inherit the fixture's 1-2-task row-group
        // parallelism (same lesson as q142's pre-explode repartition);
        // shuffling the doc-sized rows is far cheaper than the fold
        .transform(spread)
        .crossJoin(broadcast(stopShingleRowFrom(frame))))
      .select(col("doc_id"), explode(col("band_arr")).as("bs"))
      .select(
        col("doc_id"),
        col("bs.band").cast("int").as("band"),
        col("bs.sig").as("sig"))

  /** DECISION — SimHash band-width selection policy (VERDICT r13 #4,
    * declared r15; same declared-decision form as q41's as-of table).
    * The q29 family ships three band shapes; pick by documents per
    * dedup DOMAIN (per source/lang partition, not the global corpus),
    * from the measured bucket tables in BASELINE.md (round-9/13
    * DedupScale, instrument re-audited r13):
    *
    * | shape | buckets/band | recall guarantee | measured max bucket | domain bound |
    * |---|---|---|---|---|
    * | q29 4×8 over 32-bit  | 256    | hamming ≤ 3 | 8 @500 → 51 @5k → 417 @50k (saturated ≥5k) | ≤ 1k docs |
    * | q29b 4×16 over 64-bit | 65,536 | hamming ≤ 3 | 5 @5k → 8 @50k (52% occupancy @50k = onset) | ≤ 100k docs |
    * | q29c 2×32 over 64-bit | 2^32   | hamming ≤ 1 | 3 @5k → 3 @50k (flat) | ≤ ~1e9 docs |
    *
    * Selection rule: the narrowest shipped width whose measured max
    * bucket stays flat at the domain's scale — saturation onset begins
    * near 50% band occupancy (nDocs ≈ 2^width / 2), so each threshold
    * sits well below the measured saturation point. Past 100k docs the
    * hamming ≤ 3 contract moves to MinHash (q27), whose two-minima
    * string key space (~2^62) cannot saturate; 2×32 SimHash keeps only
    * the hamming ≤ 1 near-identical regime (pigeonhole: b bands
    * guarantee recall for hamming ≤ b−1). DedupSemanticsSpec holds the
    * policy to its claim: at measured scale the recommended shape keeps
    * max bucket under bound AND the rejected narrower shape violates
    * the same bound (the assertion can fail — it is not vacuous).
    */
  def recommendedSimhashBanding(nDocsPerDomain: Long): (Int, Int) =
    if (nDocsPerDomain <= 1000L) (4, 8) // q29: 32-bit signature
    else if (nDocsPerDomain <= 100000L) (4, 16) // q29b: 64-bit signature
    else (2, 32) // q29c: hamming ≤ 1 only; hamming ≤ 3 → MinHash q27

  /** SimHash banding shared by the q29 family's joins AND the
    * DedupScale bucket audit — ONE implementation so the measured
    * bucket statistics can never silently desynchronize from the band
    * keys the joins actually use (r13 instrument review: DedupScale
    * carried a hand-copied `& 255` vs q29's `% 256` — equal today only
    * because the 32-bit signature is non-negative). Returns one row
    * per (doc, band): (doc_id, <sigCol>, b, bv). The 8-bit slice keeps
    * `% 256` (the spelling the DuckDB oracle uses — identical to
    * `& 255` for the non-negative 32-bit signature); wider slices use
    * arithmetic shift + mask, where sign-fill lands above the mask so
    * negative 64-bit signatures band identically cross-engine.
    */
  private[graft] def simhashBandRows(
      sig: DataFrame, sigCol: String, nBands: Int, width: Int): DataFrame = {
    val slice =
      if (width == 8) s"shiftright($sigCol, 8 * b) % 256"
      else s"shiftright($sigCol, $width * b) & ${(1L << width) - 1}"
    sig
      .select(col("doc_id"), col(sigCol),
        explode(expr(s"sequence(0, ${nBands - 1})")).as("b"))
      .withColumn("bv", expr(slice))
  }

  /** The original grouped signature fold — all 16 permutation minima
    * as aggregate columns of one map-side-combinable groupBy over the
    * exploded shingle stream. Kept as the independent reference
    * implementation the kernel is spec-checked against; production
    * paths use [[minhashBands]].
    */
  private[graft] def minhashBandsGrouped(s: SparkSession, dir: String): DataFrame = {
    val sh = contentShingles(s, dir)
    val h = sh.withColumn(
      "h0", expr("CAST(conv(substr(md5(sh), 1, 7), 16, 10) AS BIGINT)"))
    val minAggs = minhashPerms.map { case (i, a, b) =>
      min(expr(s"($a * h0 + $b) % $P")).as(s"m$i")
    }
    val mh = h.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val stackArgs = (0 until 8)
      .map(bd => s"$bd, concat_ws(',', m${2 * bd}, m${2 * bd + 1})")
      .mkString(", ")
    mh.select(col("doc_id"), expr(s"stack(8, $stackArgs) AS (band, sig)"))
  }

  /** Row-wise MinHash LSH bands: the same 16-perm / 8-band signatures
    * as [[minhashBands]], computed per DOCUMENT ROW with higher-order
    * array expressions — no explode, no shuffle, no aggregation. This
    * is the signature path a streaming shard probe needs (stateless →
    * usable before a stream-static join) and the cheaper batch plan
    * when the doc is already in hand (signature cost stays inside the
    * scan's whole-stage codegen). q129 gates it against the SAME DuckDB
    * oracle as the grouped fold, proving the two paths identical.
    *
    * Input needs `text` and `stop_arr` (the corpus stop-shingle array,
    * see [[stopShingleRow]]); adds `band_arr:
    * ARRAY<STRUCT<band BIGINT, sig STRING>>`, empty when the document
    * yields no content shingles (< 3 tokens, or all shingles stopped) —
    * mirroring the grouped path, where such documents simply have no
    * band rows.
    */
  def withRowwiseBands(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    // The signature fold (tokenize → shingle → dedup → stop-filter →
    // md5 → 16 minima) runs in the native `minhash_mins` expression —
    // ONE compiled pass per row. Only the cheap 8-struct band assembly
    // stays in (interpreted) higher-order lambdas, LET-BOUND via
    // `transform(array(<expr>), v -> ...)` so the minima array is
    // evaluated once: a withColumn chain would be collapsed into one
    // projection by Catalyst and the kernel re-run per band. (First
    // form of this path computed the minima with nested array lambdas:
    // interpreted HOF eval measured ~2 ms/doc single-core — 66 s for
    // 5k docs at sf0.1 — vs sub-second for the compiled kernel.)
    val bandsExpr =
      "CASE WHEN mins IS NULL THEN CAST(array() AS ARRAY<STRUCT<band: BIGINT, sig: STRING>>) " +
        "ELSE transform(sequence(0, 7), b -> " +
        "named_struct('band', CAST(b AS BIGINT), 'sig', " +
        "concat(CAST(element_at(mins, 2 * b + 1) AS STRING), ',', " +
        "CAST(element_at(mins, 2 * b + 2) AS STRING)))) END"
    df.withColumn(
      "band_arr",
      expr(
        "element_at(transform(array(minhash_mins(text, stop_arr)), " +
          s"mins -> $bandsExpr), 1)"))
  }

  /** (doc_id, simhash64) — 64-bit SimHash over word 3-gram shingles:
    * the scale-path widening of [[simhashSig]] (64-bit signature,
    * 16-bit bands → 2^16 buckets per band instead of 2^8, keeping
    * bucket sizes bounded as the corpus grows).
    *
    * Measured band-capacity guidance (BASELINE.md round-9 table): at
    * 50k docs each 16-bit band is already 52% occupied — saturation
    * onset. 4×16-bit banding is sound to ~100k documents per dedup
    * domain; past that, partition the corpus (dedup per source/lang
    * domain), widen to 2×32-bit bands (GATED as q29c — hamming ≤ 1,
    * measured flat at 50k docs where 4×16 shows onset, BASELINE.md),
    * or prefer the MinHash banded path, whose two-minima string key
    * (~2^62 space) cannot saturate at any realistic corpus size.
    *
    * Bit sourcing: md5 gives 128 bits but a signed BIGINT can only
    * carry 60 of them through the `'0x...'::BIGINT` oracle route
    * (16 hex chars would overflow the sign bit), so bits 0-59 come
    * from hex chars 1-15 and bits 60-63 from hex char 16. Bit 63 of
    * the signature is the long MIN_VALUE term — DuckDB rejects
    * `1::BIGINT << 63` as overflow, so the oracle spells it as the
    * literal `-9223372036854775807 - 1` (Scala's `1L << 63` IS that
    * value). Spark-side fold: one 64-counter aggregation
    * ([[graft.functions.SimhashAggs]]), not the oracle's 64-row
    * explode.
    */
  private def simhashSig64(s: SparkSession, dir: String): DataFrame = {
    val simhash64 = udaf(graft.functions.SimhashAggs.Simhash64Agg)
    contentShingles(s, dir)
      .withColumn("ha", expr("CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("hb", expr("CAST(conv(substr(md5(sh), 16, 1), 16, 10) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(simhash64(col("ha"), col("hb")).as("simhash64"))
  }

  private val simhash64SqlCtes: String =
    s"$contentShinglesSql, " +
      "h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS ha, " +
      "('0x' || substr(md5(sh), 16, 1))::BIGINT AS hb FROM s2), " +
      "bits AS (SELECT doc_id, j, " +
      "SUM(2 * ((CASE WHEN j < 60 THEN ha >> j ELSE hb >> (j - 60) END) & 1) - 1) AS bal " +
      "FROM h, unnest(range(0, 64)) AS u(j) GROUP BY 1, 2), " +
      "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN bal > 0 THEN " +
      "(CASE WHEN j = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << j END) " +
      "ELSE 0 END) AS BIGINT) AS simhash64 FROM bits GROUP BY doc_id)"

  /** q92's blocking frame: (doc_id, lang, tok1, p, b, bv) — one row per
    * document per SimHash band of its 40-char prefix. The candidate
    * join key is (lang, tok1, b, bv): the token dimension preserves the
    * original fuzzy-dedup semantics, the band dimension bounds the
    * block. SimHash is over DISTINCT character 4-grams of the prefix
    * (~37 grams at full length), 32 bits folded by the same
    * map-side-combinable UDAF as q28, split into 4 × 8-bit bands.
    * Docs with a prefix shorter than 4 chars have no grams and drop
    * out of fuzzy candidacy (both engines identically); exact dedup
    * (q25) owns that regime. Public so DedupSemanticsSpec can
    * histogram the REAL block stream under adversarial token skew.
    */
  def fuzzyBlocks(s: SparkSession, dir: String): DataFrame = {
    val simhash32 = udaf(graft.functions.SimhashAggs.Simhash32Agg)
    val d = docs(s, dir)
      .select(
        col("doc_id"),
        col("lang"),
        expr("split_part(text, ' ', 1)").as("tok1"),
        substring(col("text"), 1, 40).as("p"))
    val sig = d
      .filter(length(col("p")) >= 4)
      .select(
        col("doc_id"),
        // per-doc distinct in the row (array_distinct): doc_id is
        // unique, so the post-explode distinct() this replaces only
        // ever deduped within a row — one exchange of the ~37×/doc
        // gram stream removed (r20, guide §2.4)
        explode(expr("array_distinct(transform(sequence(1, length(p) - 3), " +
          "i -> substring(p, i, 4)))")).as("g"))
      .withColumn("h32", expr("CAST(conv(substr(md5(g), 1, 8), 16, 10) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(simhash32(col("h32")).as("ph"))
    d.join(sig, Seq("doc_id"))
      .select(
        col("doc_id"), col("lang"), col("tok1"), col("p"),
        expr("stack(4, 0, (ph >> 0) & 255, 1, (ph >> 8) & 255, " +
          "2, (ph >> 16) & 255, 3, (ph >> 24) & 255) AS (b, bv)"))
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q25_dedup_exact",
      (s, dir) =>
        docs(s, dir)
          .groupBy(expr("md5(text)").as("h"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies")),
      Some(
        "SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS n_copies " +
          "FROM documents GROUP BY md5(text)"),
    ),
    QuerySpec(
      "q26_ngram_jaccard",
      (s, dir) => {
        // localCheckpoint: sh feeds 4 plan branches (2× sizes, 2× the
        // pair join) — materialize once instead of re-running the scan+
        // shingle explode per branch (Catalyst doesn't reuse aliased
        // subtrees; blocks are freed with the RDD, unlike cache())
        val sh = shingles(s, dir, Some(60L)).localCheckpoint()
        val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = sh.as("a")
          .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sz.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
          .join(sz.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
          .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / (na + nb - inter)"))
          .filter(col("jaccard") >= 0.015)
          .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some(
        s"WITH $shinglesSqlBounded, " +
          "sz AS (SELECT doc_id, COUNT(*) n FROM s GROUP BY 1), " +
          "p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) inter FROM s a " +
          "JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
          "SELECT da, db, round(CAST(inter AS DOUBLE)/(x.n + y.n - inter), 6) AS jaccard " +
          "FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id " +
          "WHERE CAST(inter AS DOUBLE)/(x.n + y.n - inter) >= 0.015"),
    ),
    QuerySpec(
      "q27_minhash_lsh",
      (s, dir) => {
        // materialize signatures once — the self-join would otherwise
        // run the whole shingle→minhash pipeline on both sides
        val bands = minhashBands(s, dir).localCheckpoint()
        bands.as("a")
          .join(
            bands.as("b"),
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("n_shared_bands"))
      },
      Some(
        s"WITH $contentShinglesSql, " +
          "h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 7))::BIGINT AS h0 FROM s2), " +
          "perms AS (SELECT * FROM (VALUES " +
          minhashPerms.map { case (i, a, b) => s"($i,$a,$b)" }.mkString(",") +
          ") AS v(i, a, b)), " +
          s"mh AS (SELECT doc_id, i, MIN((a * h0 + b) % $P) AS m FROM h, perms GROUP BY 1, 2), " +
          "bands AS (SELECT doc_id, i // 2 AS band, " +
          "string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS sig FROM mh GROUP BY 1, 2) " +
          "SELECT a.doc_id da, b.doc_id db, COUNT(*) AS n_shared_bands FROM bands a " +
          "JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id " +
          "GROUP BY 1, 2"),
    ),
    QuerySpec(
      "q28_simhash",
      (s, dir) => simhashSig(s, dir),
      Some(s"WITH $simhashSqlCtes SELECT doc_id, simhash FROM sig"),
    ),
    QuerySpec(
      "q28b_simhash64",
      (s, dir) => simhashSig64(s, dir),
      Some(s"WITH $simhash64SqlCtes SELECT doc_id, simhash64 FROM sig"),
    ),
    QuerySpec(
      // 64-bit near-dup pairs, 4 bands × 16 bits: the scale-path shape —
      // same pigeonhole guarantee (hamming ≤ 3 ⇒ ≥1 clean band) but
      // 2^16 buckets per band, so bucket sizes stay bounded on corpora
      // 256× larger than the 8-bit banding handles.
      "q29b_simhash64_pairs",
      (s, dir) => {
        val sig = simhashSig64(s, dir).localCheckpoint()
        val bands = simhashBandRows(sig, "simhash64", nBands = 4, width = 16)
        bands.as("a")
          .join(
            bands.as("b"),
            col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            col("a.simhash64").as("sa"), col("b.simhash64").as("sb"))
          .distinct()
          .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
          .filter(col("hamming") <= 3)
          .select("da", "db", "hamming")
      },
      Some(
        s"WITH $simhash64SqlCtes, " +
          "bands AS (SELECT doc_id, simhash64, b, (simhash64 >> (16 * b)) & 65535 AS bv " +
          "FROM sig, unnest(range(0, 4)) AS u(b)), " +
          "cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db, a.simhash64 sa, b.simhash64 sb " +
          "FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id) " +
          "SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming " +
          "FROM cand WHERE bit_count(xor(sa, sb)) <= 3"),
    ),
    QuerySpec(
      // 64-bit near-dup pairs, 2 bands × 32 bits — the documented
      // >100k-doc escape hatch (see simhashSig64's capacity guidance)
      // now GATED, not just advised: 2^32 buckets per band, so band
      // occupancy at the 4×16 saturation onset (52% at 50k docs,
      // BASELINE.md) drops to ~1e-5 — the banding cannot saturate
      // below ~10^9 docs per dedup domain. The pigeonhole trade is
      // explicit: b bands guarantee recall only for hamming ≤ b−1, so
      // this is the hamming ≤ 1 (near-identical) detector — the
      // boilerplate/mirror-corpus regime where >100k-doc domains
      // actually live; hamming ≤ 3 at that scale belongs to MinHash
      // (q27), whose key space cannot saturate. Same plan shape as
      // q29/q29b: banded self-join on (band, value), candidates only.
      "q29c_simhash64_wide_pairs",
      (s, dir) => {
        val sig = simhashSig64(s, dir).localCheckpoint()
        val bands = simhashBandRows(sig, "simhash64", nBands = 2, width = 32)
        bands.as("a")
          .join(
            bands.as("b"),
            col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            col("a.simhash64").as("sa"), col("b.simhash64").as("sb"))
          .distinct()
          .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
          .filter(col("hamming") <= 1)
          .select("da", "db", "hamming")
      },
      Some(
        s"WITH $simhash64SqlCtes, " +
          "bands AS (SELECT doc_id, simhash64, b, (simhash64 >> (32 * b)) & 4294967295 AS bv " +
          "FROM sig, unnest(range(0, 2)) AS u(b)), " +
          "cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db, a.simhash64 sa, b.simhash64 sb " +
          "FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id) " +
          "SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming " +
          "FROM cand WHERE bit_count(xor(sa, sb)) <= 1"),
    ),
    QuerySpec(
      // Near-dup pairs at hamming ≤ 3 via banded candidate generation:
      // split the 32-bit signature into 4 bands of 8 bits; by pigeonhole
      // any pair within hamming 3 agrees on ≥1 band, so the self-join is
      // on (band, band_value) — candidates only, never all pairs. At
      // 100 TB widen the signature (64/128-bit) and the bands (16-bit+)
      // so bucket sizes stay bounded; the plan shape is unchanged.
      // Which width at which scale is a DECLARED decision:
      // [[recommendedSimhashBanding]] (measured table + policy).
      "q29_simhash_pairs",
      (s, dir) => {
        // signatures materialized once (localCheckpoint) — the banded
        // self-join must not recompute the 2-shuffle simhash pipeline
        // on both sides
        val sig = simhashSig(s, dir).localCheckpoint()
        val bands = simhashBandRows(sig, "simhash", nBands = 4, width = 8)
        bands.as("a")
          .join(
            bands.as("b"),
            col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            col("a.simhash").as("sa"), col("b.simhash").as("sb"))
          .distinct()
          .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
          .filter(col("hamming") <= 3)
          .select("da", "db", "hamming")
      },
      Some(
        s"WITH $simhashSqlCtes, " +
          "bands AS (SELECT doc_id, simhash, b, (simhash >> (8 * b)) & 255 AS bv " +
          "FROM sig, unnest(range(0, 4)) AS u(b)), " +
          "cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db, a.simhash sa, b.simhash sb " +
          "FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id) " +
          "SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming " +
          "FROM cand WHERE bit_count(xor(sa, sb)) <= 3"),
    ),
    QuerySpec(
      // Fuzzy (edit-distance) dedup: levenshtein ≤ 14 on a 40-char
      // prefix fingerprint. Candidate blocking is TWO-dimensional:
      // (lang, first token) × a shared 8-bit SimHash band over the
      // prefix's character 4-grams (see [[fuzzyBlocks]]). The first
      // dimension alone is a Zipf trap — the leading token of natural
      // text concentrates ("The"/"A"/"In" can be percent-scale of an
      // English corpus) and the within-block self-join is O(block²).
      // The band dimension is uniform by CONTENT, not token frequency:
      // inside the heaviest token block, candidates still require one
      // of 4 prefix-SimHash bytes to collide, so bucket sizes track
      // true near-dup structure (identical prefixes share all bands;
      // diverse prefixes spread over 256 values per band). Recall
      // trade, stated: a pair at the far edge of the threshold whose
      // prefixes share no band is not generated — the standard LSH
      // candidate contract, same as q27/q29. The prefix cap bounds the
      // O(m·n) levenshtein cell count per pair; Spark's levenshtein()
      // and DuckDB's agree (classic Wagner-Fischer, unit costs), so
      // the oracle is exact over the same candidate set.
      "q92_fuzzy_dedup",
      (s, dir) => {
        // injects FuzzyMatchRewrite: the levenshtein <= 14 predicate
        // optimizes to a length-difference guard + the banded
        // (thresholded) DP — see graft.plans.FuzzyMatchRewrite
        graft.plans.GraftRules.ensureInjected(s)
        val banded = fuzzyBlocks(s, dir)
        banded.as("a")
          .join(
            banded.as("b"),
            col("a.lang") === col("b.lang") && col("a.tok1") === col("b.tok1") &&
              col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            col("a.p").as("pa"), col("b.p").as("pb"))
          .distinct() // a pair may collide on several bands
          .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("bigint"))
          .filter(col("dist") <= 14)
          .select(col("da"), col("db"), col("dist"))
      },
      Some(
        "WITH d AS (SELECT doc_id, lang, split_part(text, ' ', 1) AS tok1, " +
          "substr(text, 1, 40) AS p FROM documents), " +
          "g AS (SELECT DISTINCT doc_id, substr(p, i, 4) AS g " +
          "FROM d, unnest(range(1, len(p) - 2)) AS u(i) WHERE len(p) >= 4), " +
          "h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS h32 FROM g), " +
          "bits AS (SELECT doc_id, j, SUM(2 * ((h32 >> j) & 1) - 1) AS bal " +
          "FROM h, unnest(range(0, 32)) AS u(j) GROUP BY 1, 2), " +
          "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN bal > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS ph " +
          "FROM bits GROUP BY doc_id), " +
          "bd AS (SELECT d.doc_id, lang, tok1, p, b, (ph >> (8 * b)) & 255 AS bv " +
          "FROM d JOIN sig USING (doc_id), unnest(range(0, 4)) AS u(b)), " +
          "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.p AS pa, b.p AS pb " +
          "FROM bd a JOIN bd b ON a.lang = b.lang AND a.tok1 = b.tok1 " +
          "AND a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id) " +
          "SELECT da, db, CAST(levenshtein(pa, pb) AS BIGINT) AS dist " +
          "FROM cand WHERE levenshtein(pa, pb) <= 14"),
    ),
    QuerySpec(
      // Duplicated-span detection (exact-substring dedup, Lee et al.
      // 2022 "Deduplicating Training Data Makes Language Models
      // Better", arXiv:2107.06499, approximated at token-5-gram
      // granularity): per document, how many 5-gram positions are
      // covered by a gram that also appears in ≥1 OTHER document.
      // Shape at 100 TB: explode to (gram, doc) pairs → one groupBy
      // on the gram (map-side combinable; shuffle carries the gram
      // string — hash it to a long for the real corpus) → semi-join
      // back. No all-pairs anywhere.
      "q93_dup_spans",
      (s, dir) => {
        // checkpoint ONE positioned gram ARRAY per doc (r20): the
        // cross-doc test explodes a row-local array_distinct of it —
        // count(*) on that per-doc-distinct stream IS
        // countDistinct(doc_id), minus the distinct-aggregate's second
        // exchange of the gram stream (guide §2.3) — while the span
        // count explodes the positioned array unchanged.
        val grams = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 5)
          // spread the ~200× fan-out before amplification
          .transform(spread)
          .select(
            col("doc_id"),
            expr("transform(sequence(1, size(toks) - 4), " +
              "i -> concat_ws(' ', slice(toks, i, 5)))").as("garr"))
          .localCheckpoint()
        val crossDoc = grams
          .select(explode(expr("array_distinct(garr)")).as("gram"))
          .groupBy("gram")
          .agg(count(lit(1)).as("nd"))
          .filter(col("nd") >= 2)
          .select("gram")
        grams
          .select(col("doc_id"), explode(col("garr")).as("gram"))
          .join(crossDoc, Seq("gram"), "left_semi")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_dup_spans"))
      },
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents " +
          "WHERE len(string_split(text, ' ')) >= 5), " +
          "g AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS gram " +
          "FROM t, unnest(range(1, len(toks) - 3)) AS u(i)), " +
          "dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2) " +
          "SELECT doc_id, COUNT(*) AS n_dup_spans FROM g " +
          "WHERE gram IN (SELECT gram FROM dup) GROUP BY doc_id"),
    ),
    QuerySpec(
      // Cross-document 5-gram sharing profile: for each shingle
      // fingerprint, how many docs contain it; histogrammed by that
      // count — the corpus-level duplication/contamination diagnostic
      // read before choosing dedup thresholds (exact-dup profiling is
      // vacuous on this corpus: texts are unique, but ~5% of shingles
      // are shared). Scale shape: shingle explode is map-side (fan-out
      // linear in tokens), the shuffle carries (long fp) pairs via
      // q51's 60-bit md5 prefix, and both groupBys are combinable.
      "q112_ngram_sharing",
      (s, dir) => {
        val g = docs(s, dir)
          .withColumn("w", split(col("text"), " "))
          .filter(size(col("w")) >= 5)
          // spread the ~200×/doc gram fan-out + md5 work before
          // amplification (doc-sized shuffle, q142's lesson)
          .transform(spread)
          .select(
            col("doc_id"),
            // per-doc distinct in the row, ON THE FINGERPRINT (not the
            // gram), so the dedup key is bit-identical to the
            // post-explode distinct() this replaces — one exchange of
            // the exploded gram stream removed (r20, guide §2.4)
            explode(expr(
              "array_distinct(transform(transform(sequence(1, size(w) - 4), " +
                "i -> concat_ws(' ', slice(w, i, 5))), " +
                "g -> CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT)))")).as("fp"))
        g.groupBy("fp").agg(count(lit(1)).as("n_docs"))
          .groupBy("n_docs").agg(count(lit(1)).as("n_fingerprints"))
      },
      Some(
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents " +
          "WHERE len(string_split(text, ' ')) >= 5), " +
          "g AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(" +
          "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]" +
          "), 1, 15))::BIGINT AS fp FROM d, unnest(range(1, len(ws) - 3)) AS u(i)), " +
          "f AS (SELECT fp, COUNT(*) AS n_docs FROM g GROUP BY 1) " +
          "SELECT n_docs, COUNT(*) AS n_fingerprints FROM f GROUP BY 1"),
    ),
    QuerySpec(
      // Sub-document (paragraph-level) dedup WITH reconstruction — the
      // remove-and-rebuild step of exact-substring dedup (Lee et al.
      // 2022) that q93 only diagnoses: segment each document into
      // non-overlapping 4-token "paragraphs", keep only each distinct
      // segment's FIRST occurrence corpus-wide (min (doc_id, idx) —
      // one map-side-combinable groupBy on the segment, no all-pairs),
      // and re-emit every document with its surviving segments
      // re-joined in order. Shape at 100 TB: explode → groupBy(segment)
      // → join back on the segment → per-doc ordered fold; the
      // reconstruction aggregates structs sorted by position, so no
      // window or global sort exists. Non-vacuous at every fixture
      // scale (430–7,228 dropped segments).
      "q125_paragraph_dedup",
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
          .localCheckpoint() // feeds winners, kept-join, and totals
        val winners = segs.groupBy("seg")
          .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
          .select(col("seg").as("wseg"), col("w.doc_id").as("wd"), col("w.idx").as("wi"))
        val kept = segs.join(
            winners,
            col("seg") === col("wseg") &&
              col("doc_id") === col("wd") && col("idx") === col("wi"))
        val perDoc = kept.groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_kept"),
            expr("array_join(transform(array_sort(collect_list(struct(idx, seg))), " +
              "x -> x.seg), ' ')").as("dedup_text"))
        segs.groupBy("doc_id").agg(count(lit(1)).as("n_segs"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_segs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("dedup_text"), lit("")).as("dedup_text"))
      },
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
          "s AS (SELECT doc_id, CAST(i AS BIGINT) AS idx, " +
          "array_to_string(toks[(i*4+1):(i*4+4)], ' ') AS seg " +
          "FROM t, unnest(range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT))) AS u(i)), " +
          "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, idx) AS rn FROM s), " +
          "k AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept, " +
          "string_agg(seg, ' ' ORDER BY idx) AS dedup_text FROM r WHERE rn = 1 GROUP BY doc_id), " +
          "tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs FROM s GROUP BY doc_id) " +
          "SELECT tot.doc_id, n_segs, COALESCE(n_kept, 0) AS n_kept, " +
          "COALESCE(dedup_text, '') AS dedup_text " +
          "FROM tot LEFT JOIN k ON tot.doc_id = k.doc_id"),
    ),
    QuerySpec(
      // The full MinHash near-dup dedup DECISION: q27's banded
      // candidate pairs chained through connected components into
      // keeper groups (pairs alone don't dedup — A~B~C must collapse
      // to ONE keeper even when A and C never shared a band). Same
      // pairs→CC→min-keeper shape as q32b's semantic groups, driven by
      // the LSH band stream instead of embedding blocks; GraphX Pregel
      // runs on the pair list only (candidate-sized, never
      // corpus-sized). Output is every document that has at least one
      // near-dup, labeled with its group keeper.
      "q127_minhash_cc_dedup",
      (s, dir) => {
        val bands = minhashBands(s, dir).localCheckpoint()
        val pairs = bands.as("a")
          .join(
            bands.as("b"),
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("pi"), col("b.doc_id").as("pj"))
          .distinct()
        graft.pipeline.Network.connectedComponents(s, pairs)
          .select(col("probe").as("doc_id"), col("component").as("keeper"))
      },
      Some(
        s"WITH RECURSIVE $contentShinglesSql, " +
          "h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 7))::BIGINT AS h0 FROM s2), " +
          "perms AS (SELECT * FROM (VALUES " +
          minhashPerms.map { case (i, a, b) => s"($i,$a,$b)" }.mkString(",") +
          ") AS v(i, a, b)), " +
          s"mh AS (SELECT doc_id, i, MIN((a * h0 + b) % $P) AS m FROM h, perms GROUP BY 1, 2), " +
          "bands AS (SELECT doc_id, i // 2 AS band, " +
          "string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS sig FROM mh GROUP BY 1, 2), " +
          "p AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM bands a JOIN bands b " +
          "ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
          "sym AS (SELECT da AS src, db AS dst FROM p UNION SELECT db, da FROM p), " +
          "reach(id, comp) AS (SELECT src, src FROM sym UNION " +
          "SELECT sym.dst, reach.comp FROM reach JOIN sym ON reach.id = sym.src) " +
          "SELECT CAST(id AS BIGINT) AS doc_id, CAST(MIN(comp) AS BIGINT) AS keeper " +
          "FROM reach GROUP BY id"),
    ),
    QuerySpec(
      // Incremental ingestion dedup: a NEW batch (doc_id % 10 = 0)
      // checked against the EXISTING corpus (the rest) — the decision a
      // training pipeline makes on every arriving crawl shard without
      // re-deduplicating the corpus. exact_dup = fingerprint anti-check
      // (broadcast semi-join on md5); near_dup = shares a MinHash band
      // with any corpus document (semi-join on the tiny (band, sig)
      // key). Both probes are batch-sized joins against corpus-sized
      // build sides keyed on signatures, so the corpus text itself
      // never moves — exactly how an incremental dedup service runs at
      // 100 TB (corpus signatures precomputed once, batch streamed
      // through).
      "q128_incremental_dedup",
      (s, dir) => {
        val d = docs(s, dir).withColumn("fp", md5(col("text")))
        val isBatch = pmod(col("doc_id"), lit(10)) === 0
        val batch = d.filter(isBatch).select("doc_id", "fp")
        val corpusFp = d.filter(!isBatch).select(col("fp").as("cfp"))
        val bands = minhashBands(s, dir).localCheckpoint()
        val batchBands = bands.filter(pmod(col("doc_id"), lit(10)) === 0)
        val corpusBands = bands.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("band").as("cband"), col("sig").as("csig"))
        val nearIds = batchBands
          .join(
            corpusBands,
            col("band") === col("cband") && col("sig") === col("csig"),
            "left_semi")
          .select(col("doc_id")).distinct()
          .withColumn("near_dup", lit(1L))
        val exactIds = batch
          .join(corpusFp, col("fp") === col("cfp"), "left_semi")
          .select(col("doc_id")).distinct()
          .withColumn("exact_dup", lit(1L))
        batch
          .join(exactIds, Seq("doc_id"), "left")
          .join(nearIds, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("exact_dup"), lit(0L)).as("exact_dup"),
            coalesce(col("near_dup"), lit(0L)).as("near_dup"))
          .withColumn("novel",
            expr("CAST(exact_dup = 0 AND near_dup = 0 AS BIGINT)"))
      },
      Some(
        s"WITH $contentShinglesSql, " +
          "h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 7))::BIGINT AS h0 FROM s2), " +
          "perms AS (SELECT * FROM (VALUES " +
          minhashPerms.map { case (i, a, b) => s"($i,$a,$b)" }.mkString(",") +
          ") AS v(i, a, b)), " +
          s"mh AS (SELECT doc_id, i, MIN((a * h0 + b) % $P) AS m FROM h, perms GROUP BY 1, 2), " +
          "bands AS (SELECT doc_id, i // 2 AS band, " +
          "string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS sig FROM mh GROUP BY 1, 2), " +
          "d AS (SELECT doc_id, md5(text) AS fp FROM documents), " +
          "near AS (SELECT DISTINCT a.doc_id FROM bands a JOIN bands b " +
          "ON a.band = b.band AND a.sig = b.sig " +
          "AND a.doc_id % 10 = 0 AND b.doc_id % 10 != 0), " +
          "ex AS (SELECT DISTINCT a.doc_id FROM d a JOIN d b ON a.fp = b.fp " +
          "AND a.doc_id % 10 = 0 AND b.doc_id % 10 != 0) " +
          "SELECT d.doc_id, " +
          "CAST(CASE WHEN ex.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS exact_dup, " +
          "CAST(CASE WHEN near.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS near_dup, " +
          "CAST(ex.doc_id IS NULL AND near.doc_id IS NULL AS BIGINT) AS novel " +
          "FROM d LEFT JOIN ex ON d.doc_id = ex.doc_id " +
          "LEFT JOIN near ON d.doc_id = near.doc_id " +
          "WHERE d.doc_id % 10 = 0"),
    ),
    QuerySpec(
      // Row-wise MinHash signatures: the SAME 8-band LSH signatures as
      // q27's grouped fold, but computed per document row with
      // higher-order array expressions — no explode, no shuffle. This
      // is the stateless signature path the streaming incremental-dedup
      // operator probes with (a streaming shard can't run a grouped
      // fold before its stream-static join), and this gate proves it
      // bit-identical to the grouped path: the oracle below is the
      // grouped DuckDB fold. The only join is the SINGLE-ROW broadcast
      // of the corpus stop-shingle array.
      "q129_rowwise_minhash",
      (s, dir) =>
        withRowwiseBands(
          docs(s, dir).crossJoin(broadcast(stopShingleRow(s, dir))))
          .select(col("doc_id"), explode(col("band_arr")).as("bs"))
          .select(
            col("doc_id"),
            col("bs.band").as("band"),
            col("bs.sig").as("sig")),
      Some(
        s"WITH $contentShinglesSql, " +
          "h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 7))::BIGINT AS h0 FROM s2), " +
          "perms AS (SELECT * FROM (VALUES " +
          minhashPerms.map { case (i, a, b) => s"($i,$a,$b)" }.mkString(",") +
          ") AS v(i, a, b)), " +
          s"mh AS (SELECT doc_id, i, MIN((a * h0 + b) % $P) AS m FROM h, perms GROUP BY 1, 2), " +
          "bands AS (SELECT doc_id, CAST(i // 2 AS BIGINT) AS band, " +
          "string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS sig FROM mh GROUP BY 1, 2) " +
          "SELECT doc_id, band, sig FROM bands"),
    ),
    QuerySpec(
      // Exact set-similarity join with PREFIX FILTERING (the
      // PPJoin/AllPairs family: Bayardo et al. 2007, Xiao et al.
      // 2008): all pairs with shingle-set Jaccard ≥ 0.7, found
      // EXACTLY — no LSH false negatives — without the all-pairs
      // inverted-index join. Tokens are globally ordered by
      // (doc-frequency, token); a document's candidate-generating
      // prefix is its n - ceil(τ·n) + 1 RAREST shingles (any
      // qualifying pair must share a prefix token under that order),
      // and a τ·max ≤ min length filter prunes size-incompatible
      // pairs before verification. Candidates then verify with an
      // exact intersection count. At 100 TB this is the exact-join
      // complement to MinHash (q27): the prefix join touches only
      // rare tokens, so candidate volume is bounded by rare-token
      // co-occurrence, not corpus size² — and the spec asserts the
      // pruning ratio on fixtures. The corpus carries no ≥0.7 pairs
      // (max observed 0.022), so each doc is paired with a planted
      // 85%-word-prefix mutation (q33d's synthesize-inside-the-query
      // pattern); the oracle reproduces the derived corpus and brute-
      // forces it. All mutation/prefix arithmetic is integer-exact
      // ((17n+19) div 20, (7n+9) div 10) so both engines derive the
      // same corpus without float-boundary risk.
      "q142_ppjoin_exact",
      (s, dir) => ppjoinFrames(s, dir)._4,
      Some(
        "WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents " +
          "WHERE len(string_split(text,' ')) >= 3), " +
          "d AS (SELECT doc_id, toks FROM t " +
          "UNION ALL SELECT doc_id + 1000000, " +
          "toks[1:greatest(3, (17 * len(toks) + 19) // 20)] FROM t), " +
          "s AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2],' ') AS sh " +
          "FROM d, unnest(range(1, len(toks)-1)) AS u(i)), " +
          "sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY 1), " +
          "p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter FROM s a " +
          "JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
          "SELECT da, db, round(CAST(inter AS DOUBLE)/(x.n + y.n - inter), 6) AS jaccard " +
          "FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id " +
          "WHERE CAST(inter AS DOUBLE)/(x.n + y.n - inter) >= 0.7"),
    ),
    QuerySpec(
      // The COMPOSED dedup decision stack a curation pipeline actually
      // runs, as one gated query: canonical normalization (q50's pass)
      // → exact dedup on the normalized fingerprint (min-id keeper) →
      // MinHash banding + connected components over the exact
      // SURVIVORS (q127's decision, with the stop set and signatures
      // derived from the survivor corpus itself) → one verdict row per
      // document: kept / exact_dup / near_dup, with the keeper chain
      // resolved through both stages (an exact-dup's final keeper is
      // its fingerprint keeper's near-dup keeper). The fixture has no
      // exact duplicates, so each doc_id < 100 gets a planted NOISY
      // copy (upper-cased + trailing punctuation) that only
      // normalization can unify — the stage order normalize-then-
      // fingerprint is itself under test. Every stage is the already-
      // gated operator's logic; what this query gates is their
      // COMPOSITION (keeper chains, survivor scoping of the stop set,
      // stage ordering), replicated end-to-end by the oracle with a
      // recursive-CTE CC.
      "q146_dedup_stack",
      (s, dir) => {
        val base = docs(s, dir).select(col("doc_id"), col("text"))
        val derived = base.unionByName(
          base.filter(col("doc_id") < 100)
            .select(
              (col("doc_id") + 1000000L).as("doc_id"),
              concat(upper(col("text")), lit(" !!")).as("text")))
        val norm = derived
          .select(
            col("doc_id"),
            trim(regexp_replace(
              regexp_replace(lower(col("text")), lit("[^a-z0-9 ]"), lit(" ")),
              lit("  +"), lit(" "))).as("text"))
          .localCheckpoint() // feeds fingerprints, survivors, and signatures
        val withFp = norm.withColumn("fp", md5(col("text")))
        val exactKeeper = withFp.groupBy("fp").agg(min(col("doc_id")).as("exact_keeper"))
        val tagged = withFp.join(exactKeeper, "fp").select("doc_id", "text", "exact_keeper")
        val survivors = tagged.filter(col("doc_id") === col("exact_keeper"))
          .select("doc_id", "text")
        val bands = bandsFrom(survivors).localCheckpoint()
        val pairs = bands.as("a")
          .join(
            bands.as("b"),
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("pi"), col("b.doc_id").as("pj"))
          .distinct()
        val nearKeeper = graft.pipeline.Network.connectedComponents(s, pairs)
          .select(col("probe").as("skid"), col("component").as("near_keeper"))
        val survivorFinal = survivors.select(col("doc_id").as("skid"))
          .join(nearKeeper, Seq("skid"), "left")
          .select(col("skid"), coalesce(col("near_keeper"), col("skid")).as("fin"))
        tagged
          .join(survivorFinal, tagged("exact_keeper") === survivorFinal("skid"))
          .select(
            col("doc_id"), col("exact_keeper"), col("fin").as("final_keeper"),
            expr("CASE WHEN doc_id = fin THEN 'kept' " +
              "WHEN doc_id <> exact_keeper THEN 'exact_dup' " +
              "ELSE 'near_dup' END").as("status"))
      },
      Some(
        "WITH RECURSIVE derived AS (SELECT doc_id, text FROM documents " +
          "UNION ALL SELECT doc_id + 1000000, upper(text) || ' !!' " +
          "FROM documents WHERE doc_id < 100), " +
          "norm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(" +
          "lower(text), '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')) AS text FROM derived), " +
          "fpt AS (SELECT doc_id, text, md5(text) AS fp FROM norm), " +
          "ek AS (SELECT fp, MIN(doc_id) AS exact_keeper FROM fpt GROUP BY fp), " +
          "tagged AS (SELECT f.doc_id, f.text, e.exact_keeper FROM fpt f JOIN ek e ON f.fp = e.fp), " +
          "surv AS (SELECT doc_id, text FROM tagged WHERE doc_id = exact_keeper), " +
          "t AS (SELECT doc_id, string_split(text,' ') AS toks FROM surv " +
          "WHERE len(string_split(text,' ')) >= 3), " +
          "s AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2],' ') AS sh " +
          "FROM t, unnest(range(1, len(toks)-1)) AS u(i)), " +
          "s2 AS (SELECT doc_id, sh FROM s WHERE sh IN " +
          "(SELECT sh FROM s GROUP BY sh " +
          "HAVING COUNT(*) <= 0.5 * (SELECT COUNT(*) FROM surv))), " +
          "h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 7))::BIGINT AS h0 FROM s2), " +
          "perms AS (SELECT * FROM (VALUES " +
          minhashPerms.map { case (i, a, b) => s"($i,$a,$b)" }.mkString(",") +
          ") AS v(i, a, b)), " +
          s"mh AS (SELECT doc_id, i, MIN((a * h0 + b) % $P) AS m FROM h, perms GROUP BY 1, 2), " +
          "bands AS (SELECT doc_id, i // 2 AS band, " +
          "string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS sig FROM mh GROUP BY 1, 2), " +
          "p AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM bands a JOIN bands b " +
          "ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
          "sym AS (SELECT da AS src, db AS dst FROM p UNION SELECT db, da FROM p), " +
          "reach(id, comp) AS (SELECT src, src FROM sym UNION " +
          "SELECT sym.dst, reach.comp FROM reach JOIN sym ON reach.id = sym.src), " +
          "nk AS (SELECT id, MIN(comp) AS near_keeper FROM reach GROUP BY id), " +
          "sk AS (SELECT sv.doc_id AS skid, COALESCE(nk.near_keeper, sv.doc_id) AS fin " +
          "FROM surv sv LEFT JOIN nk ON nk.id = sv.doc_id) " +
          "SELECT tg.doc_id, tg.exact_keeper, sk.fin AS final_keeper, " +
          "CASE WHEN tg.doc_id = sk.fin THEN 'kept' " +
          "WHEN tg.doc_id <> tg.exact_keeper THEN 'exact_dup' " +
          "ELSE 'near_dup' END AS status " +
          "FROM tagged tg JOIN sk ON tg.exact_keeper = sk.skid"),
    ),
    QuerySpec(
      // Content-defined chunking (the rsync/LBFS/dedup-storage cut
      // rule): a chunk boundary falls wherever the Karp–Rabin
      // polynomial of the trailing 4-gram (base 131) ≡ 0 (mod 16), so
      // boundaries move WITH content — an insertion re-chunks only its
      // neighbourhood, where fixed-width chunks would shift every
      // downstream boundary and defeat dedup. Per source: chunk count,
      // distinct-chunk count (by fingerprint), duplicate-chunk ratio,
      // mean chunk length. Shapes: chunking is the native codegen'd
      // `cdc_chunks` expression (functions/CdcChunks.scala) — one
      // fused byte loop per doc inside WholeStageCodegen; the
      // higher-order filter/transform draft of the same rule ran its
      // lambda interpreted and was scan-bound at ~5 s/sf0.1 (this is
      // <1 s). Exactly the Rabin-fingerprint family production CDC
      // uses; the only shuffle is the source-keyed count-distinct.
      // CdcChunksSpec pins kernel ≡ SQL-lambda formulation.
      "q165_cdc_chunks",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        docs(s, dir)
          .select(col("source"), explode(expr("cdc_chunks(text)")).as("chunk"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_chunks"),
            countDistinct(md5(col("chunk"))).as("distinct_chunks"),
            round(lit(1.0) - countDistinct(md5(col("chunk"))) /
              count(lit(1)).cast("double"), 6).as("dup_ratio"),
            round(avg(length(col("chunk")).cast("double")), 6).as("mean_chunk_len"))
      },
      Some(
        "WITH d AS (SELECT doc_id, source, text, length(text) AS len FROM documents), " +
          "b AS (SELECT doc_id, source, text, len, " +
          "[0] || list_filter(range(4, len), " +
          "i -> (ord(substr(text, i - 3, 1)) * 2248091 + " +
          "ord(substr(text, i - 2, 1)) * 17161 + " +
          "ord(substr(text, i - 1, 1)) * 131 + " +
          "ord(substr(text, i, 1))) % 16 = 0) " +
          "|| [len] AS cuts FROM d), " +
          "c AS (SELECT doc_id, source, " +
          "substr(text, cuts[k] + 1, cuts[k + 1] - cuts[k]) AS chunk " +
          "FROM b, unnest(range(1, len(cuts))) AS u(k)) " +
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks, " +
          "CAST(COUNT(DISTINCT md5(chunk)) AS BIGINT) AS distinct_chunks, " +
          "round(1.0 - COUNT(DISTINCT md5(chunk)) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio, " +
          "round(AVG(CAST(length(chunk) AS DOUBLE)), 6) AS mean_chunk_len " +
          "FROM c GROUP BY 1"),
    ),
    QuerySpec(
      // Source novelty attribution — "what does each source actually
      // ADD?": every distinct 5-gram is attributed to the source of
      // the lowest-doc_id document containing it (the greedy corpus-
      // build order), so per source the report splits its gram volume
      // into first-seen (novel contribution) vs already-covered. The
      // deduped-pretraining diagnostic for dropping a redundant crawl.
      // Shapes: the row-local-distinct gram explode is the q112 frame
      // (array_distinct on the fingerprint, no dedup shuffle); first-seen
      // is one min-agg keyed by fingerprint; attribution joins
      // fingerprint-keyed frames; everything combinable, nothing
      // corpus-quadratic.
      "q175_source_novelty",
      (s, dir) => {
        val g = docs(s, dir)
          .withColumn("w", split(col("text"), " "))
          .filter(size(col("w")) >= 5)
          // spread the gram fan-out + md5 work before amplification
          .transform(spread)
          .select(
            col("doc_id"), col("source"),
            // per-doc distinct in the row, on the FINGERPRINT — the
            // same dedup key as the post-explode distinct() this
            // replaces, minus its full-gram-stream exchange (r20,
            // guide §2.4)
            explode(expr(
              "array_distinct(transform(transform(sequence(1, size(w) - 4), " +
                "i -> concat_ws(' ', slice(w, i, 5))), " +
                "g -> CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT)))")).as("fp"))
          // feeds first-seen AND the attribution join: materialize once
          // (the distinct's exchange used to be the shared reuse point;
          // without it the scan + fan-out + 1M md5s would run per branch)
          .localCheckpoint()
        val firstSeen = g.groupBy("fp").agg(min(col("doc_id")).as("first_doc"))
        g.join(firstSeen, Seq("fp"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_grams"),
            count(when(col("doc_id") === col("first_doc"), 1)).as("n_first_seen"),
            round(count(when(col("doc_id") === col("first_doc"), 1)) /
              count(lit(1)).cast("double"), 6).as("novelty_share"))
      },
      Some(
        "WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents " +
          "WHERE len(string_split(text, ' ')) >= 5), " +
          "g AS (SELECT DISTINCT doc_id, source, ('0x' || substr(md5(" +
          "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]" +
          "), 1, 15))::BIGINT AS fp FROM d, unnest(range(1, len(ws) - 3)) AS u(i)), " +
          "fs AS (SELECT fp, MIN(doc_id) AS first_doc FROM g GROUP BY 1) " +
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams, " +
          "CAST(COUNT(*) FILTER (doc_id = first_doc) AS BIGINT) AS n_first_seen, " +
          "round(COUNT(*) FILTER (doc_id = first_doc) / CAST(COUNT(*) AS DOUBLE), 6) " +
          "AS novelty_share " +
          "FROM g JOIN fs USING (fp) GROUP BY 1"),
    ),
    QuerySpec(
      // Asymmetric set-CONTAINMENT join (|A∩B|/|A| ≥ 0.8, A ≠ B) —
      // the subset-duplicate detector q142's symmetric Jaccard
      // misses: a snippet quoted inside a long doc scores near-zero
      // Jaccard but full containment. Same exact-join family as
      // q142: candidates via the containment prefix filter (if B
      // shares NONE of A's L = n−⌈0.8n⌉+1 rarest shingles, then
      // |A∩B| ≤ n−L < 0.8n — so A's prefix joined against B's FULL
      // shingle list is a lossless candidate set), verification by
      // per-pair array intersection, thresholds in exact integer
      // form (inter·10 ≥ 8·n — 0.8·n in doubles is not exact).
      // Corpus is the q142 derived one (base + 85%-prefix twin), so
      // true containments exist by construction. The oracle
      // recomputes intersections over co-shingled pairs only — the
      // q142 oracle's no-all-pairs shape.
      "q177_containment_join",
      (s, dir) => containmentFrames(s, dir)._4,
      Some(
        "WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents " +
          "WHERE len(string_split(text,' ')) >= 3), " +
          "d AS (SELECT doc_id, toks FROM t " +
          "UNION ALL SELECT doc_id + 1000000, " +
          "toks[1:greatest(3, (17 * len(toks) + 19) // 20)] FROM t), " +
          "s AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2],' ') AS sh " +
          "FROM d, unnest(range(1, len(toks)-1)) AS u(i)), " +
          "sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY 1), " +
          "p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter FROM s a " +
          "JOIN s b ON a.sh = b.sh AND a.doc_id <> b.doc_id GROUP BY 1, 2) " +
          "SELECT da, db, round(CAST(inter AS DOUBLE) / x.n, 6) AS containment " +
          "FROM p JOIN sz x ON p.da = x.doc_id WHERE inter * 10 >= 8 * x.n"),
    ),
  )

  /** q177 internals, exposed (like ppjoinFrames) so the DedupScale
    * audit can measure the asymmetric containment-prefix pruning:
    * returns (derived-corpus shingles, prefix tokens, candidate pairs,
    * final result). The join cost here is Σ_sh prefix(sh)·full(sh)
    * (prefix side against FULL inverted lists), not q142's Σ|b|².
    */
  private[graft] def containmentFrames(
      s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (arrs, sh) = derivedShingleFrames(s, dir)
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = sh
      .select(col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= expr("n - (8 * n + 9) DIV 10 + 1"))
      .select(col("doc_id").as("da"), col("sh"), col("n").as("na"))
    val cand = prefix
      .join(sh.select(col("doc_id").as("db"), col("sh")), Seq("sh"))
      .filter(col("da") =!= col("db"))
      .select("da", "db", "na").distinct()
    // candidate verification via per-doc shingle arrays +
    // array_intersect. The join-based alternative (expand each
    // candidate by its a-side shingles, hash-join the b-side on
    // (doc, shingle), count) was A/B-measured at sf0.1 and is
    // ~1.6× SLOWER cold (21.2 s vs 13.3 s, identical 12,033 rows):
    // the |cand|×|A| row expansion plus its shuffle costs more
    // than shipping each doc's shingle array once — arrays win
    // while |A| stays document-sized. The arrays come STRAIGHT from
    // the checkpoint. MERGE hint (r21, guide §3.1): the checkpoint's
    // origin stats read small enough to static-plan BOTH verify joins
    // as broadcasts of the ARRAY-PAYLOAD frame — two driver-side
    // ~60 MB hash-relation builds that dominated the query (A/B at
    // the bench SF: broadcast 4.91-7.12 s, merge 3.06-3.89,
    // shuffle_hash 2.99-3.82 — identical rows). Merge over
    // shuffle_hash: graceful spill on the array payload at 100 TB vs
    // a build-side OOM risk, for ~0.1-0.3 s locally.
    val result = cand
      .join(arrs.hint("merge").select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(arrs.hint("merge").select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .filter(col("inter") * 10 >= col("na") * 8)
      .select(col("da"), col("db"),
        round(col("inter") / col("na").cast("double"), 6).as("containment"))
    (sh.select("doc_id", "sh"), prefix, cand, result)
  }

  /** The derived-corpus shingle frame BOTH exact-join queries (q142
    * symmetric PPJoin, q177 asymmetric containment) start from: base
    * docs plus an 85%-prefix twin per doc (so true near-dups exist by
    * construction), 3-shingled, per-doc distinct, eagerly
    * localCheckpoint'd as ONE ARRAY ROW PER DOC (r20 optimization).
    * The r19 shape checkpointed the EXPLODED (doc_id, sh) stream after
    * a post-explode `.distinct()`: that distinct shuffled the ~30×
    * shingle stream to dedup pairs that only ever collide within one
    * document (doc_id is unique — `array_distinct` in the row is
    * equivalent, guide §2.4), and the verify step then had to
    * re-aggregate the stream BACK into per-doc arrays with a
    * collect_list groupBy per join side (two ObjectHashAggregate +
    * Exchange pairs over the 30× stream —
    * plans/r20/q177_containment_join_before.txt nodes 26-38). Storing
    * the array row serves both: consumers derive the exploded stream
    * by re-exploding the in-memory arrays (codegen-cheap), the verify
    * joins read the arrays directly, and the per-doc set size is
    * size(arr) instead of a count-over-doc window. One definition so
    * the two families can never silently diverge on their input
    * corpus. Each CALL materializes its own checkpoint on purpose:
    * q142 and q177 are benched and baselined as independent queries,
    * so they must not share work across invocations (DedupScale's
    * double compute is the accepted cost of that per-query
    * accounting).
    */
  private[graft] def derivedShingleArrays(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val derived = base.unionByName(
      base.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("slice(toks, 1, greatest(3, CAST((17 * size(toks) + 19) DIV 20 AS INT)))")
          .as("toks")))
      // the ~30× shingle fan-out must not inherit the source file's
      // task count (a single-row-group fixture scans in 1-2 tasks):
      // spread the doc-sized rows BEFORE amplification
      .transform(spread)
    derived
      .select(
        col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3))))").as("arr"))
      .localCheckpoint()
  }

  /** Exploded (doc_id, n, sh, df) stream of [[derivedShingleArrays]],
    * materialized ONCE per call next to the array frame (r21 fix for
    * VERDICT r20 #1/#2). The r20 shape re-derived the exploded view
    * per consumer — six Generate nodes in q177's plan, one of them
    * under a BroadcastExchange (the 30×-amplified stream as a
    * broadcast BUILD side, an anti-scaling pathology: driver-built,
    * 8c/32c ratio 0.81). Two further exchanges die with it:
    *  - df (per-shingle document frequency) is computed by ONE count
    *    window over the sh-keyed exchange instead of a separate
    *    groupBy aggregate + join back (the r19/r20 dfreq shape paid
    *    the sh exchange twice: once for the aggregate, once for the
    *    join probe);
    *  - the per-doc set size stays `size(arr)` from the array row.
    * A/B at the bench SF (multi8, interleaved warm reps, one JVM):
    * q177 re-explode 4.67-5.69 s / exploded-ckpt + dfreq join
    * 5.01-5.29 / THIS (window-df ckpt) 3.64-4.37; q142 prefix-ckpt
    * (r20) 4.26-5.31 / arrays-only 3.80-4.10 (forbidden shape: its
    * plan re-broadcasts a Generate of the stream) / THIS 3.04-3.14.
    * The r19 shapes measured worst of all (q177 6.05+, q142 6.62+).
    */
  private def derivedShingleFrames(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val arrs = derivedShingleArrays(s, dir)
    val sh = arrs
      .select(
        col("doc_id"), size(col("arr")).cast("long").as("n"),
        explode(col("arr")).as("sh"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .localCheckpoint()
    (arrs, sh)
  }

  private[graft] def ppjoinFrames(
      s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (arrs, sh) = derivedShingleFrames(s, dir)
    // set size rides from the array row (size(arr)); the doc-keyed
    // shuffle carries ONE window function (rarity rank)
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = sh
      .select(
        col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      // Jaccard prefix: a qualifying partner overlaps in ≥ ceil(τ·n)
      // tokens, so the rarest n - ceil(τ·n) + 1 must hit
      .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + 1)
      .select(col("doc_id"), col("sh"), col("n"))
    // prefix is NOT checkpointed (r20 did; measured +1.1-1.2 s): both
    // self-join sides re-run only the doc-keyed rank window over the
    // materialized stream, and their identical exchanges are deduped
    // by ReuseExchange — the eager barrier cost more than the reuse
    // saved (r21 A/B: prefix-ckpt 4.26-5.31 s vs this 3.04-3.14 s)
    // sizes ride through the candidate join — no post-hoc size joins
    val cand = prefix.as("a")
      .join(
        prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: τ·max ≤ min, exact integer form
          col("b.n") * 10 >= col("a.n") * 7 && col("a.n") * 10 >= col("b.n") * 7)
      .select(
        col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    // verification: per-doc shingle-set arrays (bounded by doc length),
    // intersection counted per candidate ROW — no pair×token re-explode;
    // the arrays come STRAIGHT from the checkpoint. MERGE hint: same
    // broadcast-of-the-array-payload pathology and A/B as
    // containmentFrames (broadcast 3.86-5.86 s, merge 3.25-3.41)
    val result = cand
      .join(arrs.hint("merge").select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(arrs.hint("merge").select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / (na + nb - inter)"))
      .filter(col("jaccard") >= 0.7)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
    (sh.select("doc_id", "sh"), prefix, cand.select("da", "db"), result)
  }
}

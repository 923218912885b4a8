package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer over a FIXED, hardcoded merge table —
  * the deterministic stand-in for a learned tokenizer (no model files
  * in this environment). Real pipelines load a learned merge table;
  * the algorithm below is the standard one and the table is swappable.
  *
  * Apply semantics: merges are applied in rank order, each as one
  * leftmost, non-overlapping replace-all pass over the word's symbol
  * sequence. Because a merge can only create pairs involving its own
  * output symbol — whose merges all rank later (enforced by the
  * monotonicity `require` below) — this is provably equivalent to the
  * classic greedy lowest-rank-first loop (property-checked against an
  * independent greedy implementation in BpeSpec).
  *
  * Words are whitespace-split first (matching q22's `split(text,' ')`
  * pre-tokenization); merges never cross word boundaries.
  *
  * SQL oracle: a word is encoded symbol-wise as <S>sym<E>…, so a
  * merge is literally `replace(s, '<S>l<E><S>r<E>',
  * '<S>lr<E>')` — SQL replace is leftmost non-overlapping, the
  * identical semantics. Token count = occurrences of <S> (chr(1)). (Assumes
  * the corpus contains no 0x01/0x02 bytes — true for the fixture's
  * printable-ASCII text.)
  */
object Bpe {

  /** Merge table in rank order: 50 character-level merges (common
    * English digraphs) then larger units composed of earlier outputs.
    */
  val merges: Vector[(String, String)] = Vector(
    // rank 0-49: character pairs
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("t", "o"), ("n", "t"), ("n", "g"), ("s", "e"),
    ("h", "a"), ("a", "s"), ("o", "u"), ("i", "o"), ("l", "e"),
    ("v", "e"), ("c", "o"), ("m", "e"), ("d", "e"), ("h", "i"),
    ("r", "i"), ("r", "o"), ("i", "c"), ("n", "e"), ("e", "a"),
    ("r", "a"), ("c", "e"), ("l", "i"), ("c", "h"), ("l", "l"),
    ("b", "e"), ("m", "a"), ("s", "i"), ("o", "m"), ("u", "r"),
    // rank 50-61: more character pairs feeding the larger units
    ("n", "o"), ("u", "t"), ("w", "h"), ("s", "s"), ("k", "e"),
    ("a", "b"), ("s", "o"), ("w", "i"), ("c", "a"), ("m", "o"),
    ("o", "v"), ("p", "e"),
    // rank 62+: multi-character units (every side is an earlier output)
    ("th", "e"), ("in", "g"), ("an", "d"), ("ti", "on"), ("en", "t"),
    ("io", "n"), ("f", "or"), ("al", "l"), ("all", "y"), ("ou", "r"),
    ("ou", "t"), ("an", "t"), ("en", "d"), ("ar", "e"), ("is", "h"),
    ("it", "y"), ("ve", "r"), ("th", "at"), ("th", "is"), ("w", "it"),
    ("wit", "h"), ("he", "r"), ("ha", "ve"), ("f", "ro"), ("fro", "m"),
    ("no", "t"), ("b", "ut"), ("y", "ou"), ("wh", "ic"), ("whic", "h"),
    ("the", "y"), ("the", "re"), ("co", "m"), ("com", "e"), ("ma", "n"),
    ("me", "nt"), ("ne", "ss"), ("li", "ke"), ("ti", "me"), ("ab", "le"),
    ("w", "or"), ("wor", "d"), ("al", "so"), ("wi", "ll"), ("ca", "n"),
    ("mo", "re"), ("so", "me"), ("ov", "er"), ("pe", "r"), ("w", "as"),
    ("hi", "s"), ("wh", "en"), ("wh", "at"), ("at", "e"), ("er", "s"),
    ("re", "s"), ("on", "s"), ("es", "s"), ("at", "i"), ("ati", "on"),
  )

  // monotonicity: each side of a merge must be a single character or
  // the output of an EARLIER merge — this is what makes rank-order
  // replace-all equivalent to greedy lowest-rank-first (see Scaladoc)
  require(merges.distinct.size == merges.size, "duplicate merge pairs")
  // distinct OUTPUTS too (r15 functions review): the equivalence proof
  // also needs each output string produced by exactly one merge — with
  // two merges i<k both emitting "abc", a rank-j consumer of "abc"
  // (i<j<k) would run its pass BEFORE rank k creates more "abc"
  // symbols, silently diverging from greedy on a swapped-in table
  // while every other require passes
  require(merges.map { case (l, r) => l + r }.distinct.size == merges.size,
    "duplicate merge outputs break the replace-all ≡ greedy equivalence")
  merges.zipWithIndex.foreach { case ((l, r), k) =>
    val earlier = merges.take(k).map { case (a, b) => a + b }.toSet
    require(l.length == 1 || earlier.contains(l), s"merge $k left '$l' not yet derivable")
    require(r.length == 1 || earlier.contains(r), s"merge $k right '$r' not yet derivable")
  }

  // (l, r, l+r) with the merged string precomputed: every symbol is a
  // contiguous substring of the raw word, so a merge can fire only if
  // the RAW word contains l+r — a String.contains precheck skips the
  // symbol-array pass for the vast majority of the 122 merges
  private val mergeStrs: Array[(String, String, String)] =
    merges.map { case (l, r) => (l, r, l + r) }.toArray

  /** Tokenize one word; returns the number of BPE tokens.
    *
    * Base symbols are CODEPOINTS, not UTF-16 code units: an astral
    * character (emoji, rare CJK) must count as ONE un-merged symbol —
    * `word.map(_.toString)` would split it into two surrogate halves
    * and diverge from the DuckDB oracle's per-character substr walk.
    * Identical on ASCII/BMP text, so gated results are unchanged.
    */
  def tokenizeWordCount(word: String): Int = {
    if (word.isEmpty) return 0
    var syms: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var m = 0
    while (m < mergeStrs.length && syms.length > 1) {
      val (l, r, lr) = mergeStrs(m)
      if (word.contains(lr)) {
        // leftmost non-overlapping replace-all pass
        var i = 0
        var changed = false
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += lr; i += 2; changed = true
          } else { out += syms(i); i += 1 }
        }
        if (changed) syms = out.toArray
      }
      m += 1
    }
    syms.length
  }

  /** Total BPE tokens over a whitespace-split text. */
  def countTokens(text: String): Long = {
    var total = 0L
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        total += tokenizeWordCount(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Codegen entry point (static forwarder visible from generated Java). */
  def countTokens(s: UTF8String): Long = countTokens(s.toString)

  /** DuckDB oracle: the identical rank-order replace chain over the
    * <S>sym<E> word encoding (see Scaladoc).
    */
  def duckdbOracleSql: String = {
    val S = "\u0001"; val E = "\u0002"
    val base = "array_to_string(list_transform(range(1, length(word) + 1), " +
      s"i -> chr(1) || substr(word, CAST(i AS INT), 1) || chr(2)), '')"
    // batches of 16 nested replaces per CTE: a single 122-deep nesting
    // exceeds DuckDB 1.0's 128-level binder recursion limit
    val batches = merges.grouped(16).toVector
    val ctes = batches.zipWithIndex.map { case (batch, b) =>
      val chain = batch.foldLeft("s") { case (acc, (l, r)) =>
        s"replace($acc, '$S$l$E$S$r$E', '$S$l$r$E')"
      }
      s"enc${b + 1} AS (SELECT doc_id, $chain AS s FROM enc$b)"
    }
    // NULL-text guard mirrors the Spark side's filter (r15 functions
    // review): unnest(string_split(NULL,' ')) yields ZERO rows here
    // while the null-intolerant expression emits a (doc_id, NULL) row —
    // a silent row-set divergence the moment the corpus has a NULL text
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
      "FROM documents WHERE text IS NOT NULL), " +
      s"enc0 AS (SELECT doc_id, $base AS s FROM w), " +
      ctes.mkString(", ") + " " +
      "SELECT doc_id, CAST(SUM(length(s) - length(replace(s, chr(1), ''))) AS BIGINT) " +
      s"AS n_bpe_tokens FROM enc${batches.size} GROUP BY doc_id"
  }
}

/** `bpe_token_count(text)` — BPE token count with [[Bpe]]'s fixed merge
  * table. The generated code calls the static kernel, so the expression
  * stays inside whole-stage codegen spans.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bpe_token_count requires STRING")

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(s: Any): Any =
    Bpe.countTokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

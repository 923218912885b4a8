package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `minhash_mins(text, stop_arr)` — the 16 per-permutation MinHash
  * minima of a document's stop-filtered distinct word-3-gram shingles,
  * in ONE compiled pass over the text: tokenize, shingle, dedup,
  * stop-filter, md5, fold all 16 `(a·h + b) mod p` minima per shingle.
  *
  * This is the native-Expression form of the row-wise signature path:
  * the same computation expressed with higher-order array lambdas runs
  * interpreted (HigherOrderFunction has no codegen) at ~2 ms/doc;
  * this expression is plain compiled Scala invoked from generated
  * code. Bit-identical to the grouped [[graft.operators.DedupOps]]
  * fold and to the DuckDB oracle (q129 gates all three): tokens split
  * on single spaces KEEPING empties (Spark `split` semantics), shingle
  * hash = first 7 md5 hex chars as an integer, permutation table
  * [[MinhashMins.perms]].
  *
  * Returns NULL when the document yields no content shingles (< 3
  * tokens, or every shingle stop-filtered) — mirroring the grouped
  * path, where such documents simply have no rows.
  */
case class MinhashMins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "minhash_mins requires (STRING, ARRAY<STRING>)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_mins"

  override def nullSafeEval(t: Any, stopAny: Any): Any =
    MinhashMins.compute(
      t.asInstanceOf[UTF8String], stopAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      s"""
         |${ev.value} = graft.functions.MinhashMins.compute($t, $s);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashMins =
    copy(left = newLeft, right = newRight)
}

object MinhashMins {
  /** The 16 fixed permutations (i, a, b) of `(a·h + b) mod P` — the
    * single source of truth; DedupOps builds its SQL oracles from this
    * same table.
    */
  val perms: Seq[(Int, Int, Int)] = Seq(
    (0, 737, 941), (1, 1553, 2087), (2, 2671, 3217), (3, 3823, 4391),
    (4, 4973, 5519), (5, 6101, 6689), (6, 7237, 7829), (7, 8389, 8969),
    (8, 9511, 10111), (9, 10663, 11261), (10, 11779, 12409), (11, 12917, 13553),
    (12, 14081, 14699), (13, 15227, 15859), (14, 16381, 17011), (15, 17519, 18149),
  )
  val P = 2147483647L // 2^31 - 1

  private val A: Array[Long] = perms.map(_._2.toLong).toArray
  private val B: Array[Long] = perms.map(_._3.toLong).toArray

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-thread CONTENT-keyed stop-set cache: (defensive copy of the
    * stop array's UTF8Strings, the materialized set). Validation is an
    * O(k) BYTEWISE comparison per row (UTF8String.equals — no decode,
    * no allocation), replacing the O(k) String-decode + HashSet build
    * a miss pays. Content-keyed, not identity-keyed: the r12 advice
    * stands — an engine path may lawfully reuse ONE buffer with
    * DIFFERENT contents, so instance identity proves nothing, while
    * bytewise equality proves exactly what the cache needs, with no
    * stability assumption about the producer at all. (r15 functions
    * review: the former identity-keyed cache, gated on
    * `right.foldable`, was DEAD on every gated path — the stop array
    * arrives via a broadcast cross join, whose per-row accessor wraps
    * a fresh ArrayData instance, so neither the foldable gate nor the
    * `eq` check ever hit and the kernel rebuilt the set per document.)
    */
  private val stopCache =
    new ThreadLocal[(Array[UTF8String], java.util.HashSet[String])]

  /** Stop-set builds since JVM start — test hook proving the cache
    * actually fires (equal-content rows must not re-build).
    */
  private[functions] val buildCount = new java.util.concurrent.atomic.AtomicLong

  private def buildStopSet(stopArr: ArrayData): java.util.HashSet[String] = {
    buildCount.incrementAndGet(): Unit
    val stop = new java.util.HashSet[String](stopArr.numElements() * 2)
    var i = 0
    while (i < stopArr.numElements()) {
      if (!stopArr.isNullAt(i)) stop.add(stopArr.getUTF8String(i).toString)
      i += 1
    }
    stop
  }

  private def cachedStopSet(stopArr: ArrayData): java.util.HashSet[String] = {
    val n = stopArr.numElements()
    val cached = stopCache.get()
    if (cached != null && cached._1.length == n) {
      var i = 0
      var same = true
      while (same && i < n) {
        val c = cached._1(i)
        if (stopArr.isNullAt(i)) same = c == null
        else same = c != null && stopArr.getUTF8String(i).equals(c)
        i += 1
      }
      if (same) return cached._2
    }
    // defensive copies: the cache key must not alias a reusable buffer
    val copy = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      copy(i) = if (stopArr.isNullAt(i)) null else stopArr.getUTF8String(i).clone()
      i += 1
    }
    val set = buildStopSet(stopArr)
    stopCache.set((copy, set))
    set
  }

  /** Compiled kernel — public static so generated code can call it.
    * The stop set is served from the content-keyed per-thread cache
    * above: correct for any producer (mutated buffers fail the
    * bytewise check and rebuild), cheap for the gated shape (the same
    * broadcast stop array arrives every row).
    */
  def compute(text: UTF8String, stopArr: ArrayData): ArrayData = {
    // Spark split semantics: single-space regex, limit -1 (KEEP empty
    // tokens) — must match `split(text, ' ')` exactly
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return null
    var stop: java.util.HashSet[String] = null
    if (stopArr.numElements() > 0) stop = cachedStopSet(stopArr)
    val md = digest.get()
    val seen = new java.util.HashSet[String](toks.length * 2)
    val mins = Array.fill(16)(Long.MaxValue)
    var any = false
    var i = 0
    while (i <= toks.length - 3) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      // distinct first (the grouped path dedups before the stop
      // filter; same result either way for a set filter)
      if (seen.add(sh) && (stop == null || !stop.contains(sh))) {
        any = true
        md.reset()
        val d = md.digest(sh.getBytes(StandardCharsets.UTF_8))
        // first 7 hex chars of the md5 as an integer = top 28 bits
        val h0 = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
          ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
        var j = 0
        while (j < 16) {
          val v = (A(j) * h0 + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}

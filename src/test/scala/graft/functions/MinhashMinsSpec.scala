package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native minhash_mins kernel must agree with the SQL/HOF
  * semantics it replaced on the edges the fixture never exercises:
  * empty text, < 3 tokens, consecutive spaces (EMPTY tokens — Spark
  * split keeps them), multi-byte UTF-8, and fully stop-filtered
  * documents. The reference truth here is the same computation spelled
  * with built-in expressions (split/transform/md5/conv), let-bound so
  * it evaluates correctly — slow but unambiguous.
  */
class MinhashMinsSpec extends SparkSpec {

  private def hofMins(stop: Seq[String]): org.apache.spark.sql.Column = {
    val aArr = MinhashMins.perms.map(_._2).mkString("array(", ", ", ")")
    val bArr = MinhashMins.perms.map(_._3).mkString("array(", ", ", ")")
    val stopLit =
      if (stop.isEmpty) "CAST(array() AS ARRAY<STRING>)"
      else stop.map(s => s"'$s'").mkString("array(", ", ", ")")
    val shs =
      "CASE WHEN size(toks) >= 3 THEN array_distinct(" +
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    val hs =
      s"transform(filter(shs, x -> NOT array_contains($stopLit, x)), " +
        "x -> CAST(conv(substr(md5(x), 1, 7), 16, 10) AS BIGINT))"
    val mins =
      s"transform(sequence(0, 15), i -> array_min(transform(hs, " +
        s"h -> (element_at($aArr, i + 1) * h + element_at($bArr, i + 1)) % ${MinhashMins.P})))"
    expr(
      "element_at(transform(array(split(text, ' ')), toks -> " +
        s"element_at(transform(array($shs), shs -> " +
        s"element_at(transform(array($hs), hs -> " +
        s"CASE WHEN size(hs) > 0 THEN $mins ELSE NULL END), 1)), 1)), 1)")
  }

  test("kernel equals built-in-expression semantics on adversarial texts") {
    val s = spark; import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(s)
    val stop = Seq("a b c", "naïve café déjà")
    val texts = Seq(
      "",                           // empty
      "one",                        // 1 token
      "one two",                    // 2 tokens — no shingles
      "one two three",              // exactly one shingle
      "a b c",                      // its only shingle is stopped
      "a b c d",                    // one stopped + one content shingle
      "x  y  z w",                  // consecutive spaces → EMPTY tokens
      " leading and trailing ",     // boundary empties
      "naïve café déjà vu über straße", // multi-byte UTF-8
      "dup dup dup dup dup",        // all shingles identical → distinct=1
      "☃ ❄ ☃ ❄ ☃",                 // non-BMP-ish symbols
    )
    val df = texts.toDF("text")
      .withColumn("stop_arr", typedLit(stop))
      .withColumn("native", expr("minhash_mins(text, stop_arr)"))
      .withColumn("builtin", hofMins(stop))
    val rows = df.select("text", "native", "builtin").collect()
    rows.foreach { r =>
      val (n, b) = (r.get(1), r.get(2))
      assert(n == b, s"kernel≠builtin for ${r.getString(0).take(40)}: $n vs $b")
    }
    // non-vacuous: some null, some non-null
    assert(rows.exists(_.get(1) == null) && rows.exists(_.get(1) != null))
  }

  test("stop-set cache is content-keyed: mutated buffers re-read, equal contents hit (ADVICE r12 / r15 review)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // correctness half: one ArrayData INSTANCE whose backing contents
    // change between rows — the buffer-reusing accessor shape an
    // identity-keyed cache cannot distinguish. The bytewise content
    // check must fail and the set must be rebuilt from the NEW
    // contents.
    val backing = Array[Any](UTF8String.fromString("a b c"))
    val arr = new GenericArrayData(backing)
    val text = UTF8String.fromString("a b c d") // shingles: "a b c", "b c d"
    val minsStopAbc = MinhashMins.compute(text, arr)
    backing(0) = UTF8String.fromString("b c d") // same instance, new contents
    val minsStopBcd = MinhashMins.compute(text, arr)
    assert(minsStopAbc != null && minsStopBcd != null)
    // surviving shingle differs ("b c d" vs "a b c") → signatures differ;
    // a stale cached set would return identical arrays for both calls
    assert(!minsStopAbc.asInstanceOf[GenericArrayData].array
        .sameElements(minsStopBcd.asInstanceOf[GenericArrayData].array),
      "stale stop set served after the backing buffer was mutated")
    // effectiveness half (r15 review: the old foldable-gated cache was
    // DEAD on every gated path — the broadcast cross join wraps a
    // fresh ArrayData per row, so it rebuilt per document): DISTINCT
    // instances with EQUAL contents must be served from the cache, not
    // rebuilt. Falsifiable via the build counter.
    val fresh1 = new GenericArrayData(Array[Any](UTF8String.fromString("b c d")))
    val warm = MinhashMins.compute(text, fresh1) // ensure cached on this thread
    val before = MinhashMins.buildCount.get()
    val fresh2 = new GenericArrayData(Array[Any](UTF8String.fromString("b c d")))
    val minsFresh = MinhashMins.compute(text, fresh2)
    assert(MinhashMins.buildCount.get() == before,
      "equal-content stop array was re-built — the cache never fires")
    assert(minsFresh.asInstanceOf[GenericArrayData].array
      .sameElements(minsStopBcd.asInstanceOf[GenericArrayData].array))
    assert(warm != null)
  }

  test("kernel bands equal the grouped fold on the sf0.001 fixture") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    // the INDEPENDENT witness: the original shuffle-based fold
    val grouped = graft.operators.DedupOps.minhashBandsGrouped(s, sfDir)
      .select(col("doc_id"), col("band").cast("long").as("band"), col("sig"))
    val rowwise = graft.SparkEntry.queries("q129_rowwise_minhash")(s, sfDir)
    assert(grouped.count() > 1000, "fixture too small for a meaningful check")
    assert(rowwise.exceptAll(grouped).isEmpty && grouped.exceptAll(rowwise).isEmpty,
      "row-wise kernel and grouped fold disagree")
  }
}

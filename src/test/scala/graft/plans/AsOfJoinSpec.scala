package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The native as-of operator: planned shape (merge walk over
  * co-partitioned sorted children — no union, no window), equivalence
  * with the q41 composition under adversarial inputs (ties, unmatched
  * keys, key-boundary adjacency across the merge), and null handling.
  */
class AsOfJoinSpec extends SparkSpec {

  private def mkDf(rows: Seq[(Long, Long, Long)], names: (String, String, String)) = {
    val s = spark; import s.implicits._
    rows.toDF(names._1, names._2, names._3)
      .withColumn(names._2, timestamp_micros(col(names._2)))
  }

  test("plan: AsOfJoinExec with exchanges+sorts, no union, no window") {
    val left = mkDf(Seq((1L, 100L, 10L)), ("k", "ts", "lv"))
    val right = mkDf(Seq((1L, 50L, 20L)), ("rk", "rts", "rv"))
    val df = AsOfJoin.asof(left, right, "k", "rk", "ts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("Exchange"), plan)
    assert(!plan.contains("Union") && !plan.contains("Window"), plan)
  }

  test("adversarial equivalence with the union-and-carry composition") {
    val s = spark; import s.implicits._
    // deterministic pseudo-random corpus: hash-derived, heavy key
    // collisions, exact ts ties left-vs-right, keys with no matches
    def h(i: Long, salt: Long): Long = {
      var x = i * 2654435761L + salt
      x ^= x >>> 16; x *= 2246822519L; x ^= x >>> 13
      math.abs(x)
    }
    val lefts = (0 until 400).map { i =>
      (h(i, 1) % 17, 1000L + h(i, 2) % 300, i.toLong)
    }
    val rights = (0 until 300).map { i =>
      // key range 0..20: some keys never match a left, some lefts have
      // no right; ts range overlaps so exact ties occur
      (h(i, 3) % 21, 1000L + h(i, 4) % 300, 1000L + i)
    }
    // dedup rights per (key, ts) to the max payload — the determinism
    // precondition both implementations document
    val left = mkDf(lefts, ("k", "ts", "lid"))
    val right = mkDf(rights, ("rk", "rts", "rid"))
      .groupBy("rk", "rts").agg(max(col("rid")).as("rid"))

    val native = AsOfJoin.asof(left, right, "k", "rk", "ts", "rts")
      .select(col("k"), col("ts"), col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet

    // independent composition: q41's union-and-carry pattern
    val tagged = right
      .select(col("rk").as("k"), col("rts").as("ts"), lit(null).cast("long").as("lid"),
        col("rid"), lit(0).as("side"))
      .unionByName(left.select(col("k"), col("ts"), col("lid"),
        lit(null).cast("long").as("rid"), lit(1).as("side")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("ts", "side")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val composed = tagged
      .withColumn("carry", last(when(col("side") === 0, col("rid")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("k"), col("ts"), col("lid"), col("carry").as("rid"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet

    assert(native == composed)
    assert(native.size == 400) // left join: every left row exactly once
  }

  test("cross-side ts type mismatch is rejected loudly (was: silent wrong-unit compare)") {
    val s = spark; import s.implicits._
    // left ts = DateType (days since epoch), right ts = TimestampType
    // (microseconds): the old raw-long walk compared 20000 days against
    // 1.7e15 µs and returned all-null right sides with no error
    val left = Seq((1L, "2024-01-02", 10L)).toDF("k", "ts", "lv")
      .withColumn("ts", to_date(col("ts")))
    val right = mkDf(Seq((1L, 50L, 20L)), ("rk", "rts", "rv"))
    val e = intercept[Exception] {
      AsOfJoin.asof(left, right, "k", "rk", "ts", "rts").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("ts types differ"),
      s"wrong failure: ${e.getMessage}")
  }

  test("self-join with shared attributes is rejected loudly (no DeduplicateRelations support)") {
    val left = mkDf(Seq((1L, 100L, 10L)), ("k", "ts", "v"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, left, "k", "k", "ts", "ts")
    }
    assert(e.getMessage.contains("alias the right side"), e.getMessage)
    // and the documented fix works: fresh ids via per-column aliases
    val renamed = left.select(
      col("k").as("k2"), col("ts").as("ts2"), col("v").as("v2"))
    val ok = AsOfJoin.asof(left, renamed, "k", "k2", "ts", "ts2").collect()
    assert(ok.length == 1 && !ok(0).isNullAt(3), "aliased self-join must match itself")
  }

  test("null left keys emit null-right rows; null right keys are discarded") {
    val s = spark; import s.implicits._
    val left = Seq((Some(1L), 100L, 1L), (None, 200L, 2L))
      .toDF("k", "tsu", "lid").withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
    val right = Seq((Some(1L), 50L, 10L), (None, 10L, 20L))
      .toDF("rk", "rtsu", "rid").withColumn("rts", timestamp_micros(col("rtsu"))).drop("rtsu")
    val out = AsOfJoin.asof(left, right, "k", "rk", "ts", "rts")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(1L -> Some(10L), 2L -> None))
  }

  test("degradation: right side absent-per-key or all-late null-emits for every left row") {
    // the all-miss edge (VERDICT r12 stretch): the randomized corpus
    // exercises ties and partial misses, but never a whole stream where
    // NO left row can match. Keys 0..9 have no right rows at all; keys
    // 10..19 have right rows strictly LATER than every left ts — the
    // merge walk must null-emit all 200 lefts, exactly like the
    // composition's carry (which finds no side=0 row to carry).
    val lefts = (0 until 200).map(i => ((i % 20).toLong, 1000L + i, i.toLong))
    val rights = (0 until 100).map(i => (10L + i % 10, 5000L + i, 1000L + i))
    val left = mkDf(lefts, ("k", "ts", "lid"))
    val right = mkDf(rights, ("rk", "rts", "rid"))
    val out = AsOfJoin.asof(left, right, "k", "rk", "ts", "rts")
      .select("lid", "rid").collect()
    assert(out.length == 200, s"left join cardinality broke: ${out.length}")
    assert(out.forall(_.isNullAt(1)),
      "a late or absent right row leaked into the as-of result")
    // falsifiability: ONE early right row on one key must flip exactly
    // that key's 10 left rows to matches — proves the all-null reading
    // above is about the data, not a join that never matches anything
    val right2 = mkDf(rights :+ ((15L, 0L, 777L)), ("rk", "rts", "rid"))
    val out2 = AsOfJoin.asof(left, right2, "k", "rk", "ts", "rts")
      .select("k", "rid").collect()
    val matched = out2.filter(!_.isNullAt(1))
    assert(matched.length == 10 && matched.forall(r =>
      r.getLong(0) == 15L && r.getLong(1) == 777L), s"got ${matched.length} matches")
  }

  test("fixture parity: q41b equals q41 row-for-row") {
    val dir = "/root/testdata/sf0.001"
    def canon(name: String) = SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(canon("q41b_asof_native") == canon("q41_asof_join"))
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** State-SIZE audit (VERDICT r9 #7) for the two streaming twins whose
  * state keys grow with the CORPUS, not with a bounded dimension —
  * nearDupPairsStream (one state row per occupied SimHash band bucket)
  * and incrementalDedupStream (one aggregation row per in-flight
  * (ts, doc) decision). Their correctness was already proven ≡ batch;
  * this spec asserts the 100 TB property: watermark eviction actually
  * evicts, so state-store row counts (the engine's own
  * StateOperatorProgress.numRowsTotal) return to the live-window bound
  * after the watermark passes a generation of keys, instead of
  * accumulating with stream length.
  */
class StreamingStateSizeSpec extends SparkSpec {

  /** (current, peak) state rows: current from the latest progress
    * entry, peak across the whole progress history. The peak is where
    * both generations are visible — Spark runs a no-data micro-batch
    * as soon as the watermark advances, so eviction lands before the
    * next addData and the current reading alone would make the
    * "state accumulated first" precondition invisible.
    */
  private def stateRows(
      q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
    val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(ps.nonEmpty, "no state-operator progress reported")
    val sums = ps.map(_.stateOperators.map(_.numRowsTotal).sum)
    (sums.last, sums.max)
  }

  test("nearDupPairsStream: bucket state is bounded by the live window") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[SigEv]
    // 1 h watermark; signatures spread via a golden-ratio multiplier so
    // each doc occupies ~4 distinct band buckets
    val q = Streams.nearDupPairsStream(input.toDF(), watermarkMs = 3600000L)
      .writeStream.format("memory").queryName("neardup_state")
      .outputMode("append").start()
    def sig(i: Long): Long = i * 0x9e3779b97f4a7c15L
    try {
      val genA = (0L until 30L).map(i =>
        SigEv(i, sig(i), Timestamp.valueOf("2024-01-01 10:00:00")))
      val genB = (100L until 130L).map(i =>
        SigEv(i, sig(i), Timestamp.valueOf("2024-01-01 14:00:00")))
      input.addData(genA: _*); q.processAllAvailable()
      val (afterA, _) = stateRows(q)
      // ≤ 4 buckets per doc; > 0 proves the counter observes this op
      assert(afterA > 0 && afterA <= 4 * 30, s"gen A bucket rows: $afterA")
      input.addData(genB: _*); q.processAllAvailable()
      input.addData(SigEv(999L, sig(999L), Timestamp.valueOf("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val (fin, peak) = stateRows(q)
      // precondition: both generations coexisted in state at some point
      // (the data batch before the watermark-advance eviction batch) —
      // without this the shrink assertion below would be vacuous
      assert(peak > afterA, s"peak $peak never exceeded gen-A-only $afterA")
      assert(fin <= 4 * 31,
        s"state must shrink to the live window (gen B + 1): $fin rows (peak $peak)")
      assert(fin < peak, s"no eviction observed: final $fin vs peak $peak")
    } finally q.stop()
  }

  test("incrementalDedupStream: decision-fold state is bounded by the live window") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    // synthetic static corpus (state size is independent of probe hits)
    val corpusFp = Seq("0123456789abcdef0123456789abcdef").toDF("cfp")
    val corpusBands = Seq((0L, "1,1")).toDF("cband", "csig")
    val input = MemoryStream[DocEv]
    val q = Streams
      .incrementalDedupStream(input.toDF(), corpusFp, corpusBands, Seq.empty, "1 hour")
      .writeStream.format("memory").queryName("incdedup_state")
      .outputMode("append").start()
    try {
      val genA = (0L until 20L).map(i =>
        DocEv(i, s"alpha document number $i with some words", Timestamp.valueOf("2024-01-01 10:00:00")))
      val genB = (100L until 120L).map(i =>
        DocEv(i, s"beta document number $i with other words", Timestamp.valueOf("2024-01-01 14:00:00")))
      input.addData(genA: _*); q.processAllAvailable()
      val (afterA, _) = stateRows(q)
      assert(afterA > 0 && afterA <= 20, s"gen A groups: $afterA")
      input.addData(genB: _*); q.processAllAvailable()
      // the watermark pass over gen A finalizes (emits + evicts) its
      // (ts, doc) groups
      input.addData(DocEv(999L, "gamma flush document", Timestamp.valueOf("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val (fin, peak) = stateRows(q)
      assert(peak > afterA, s"peak $peak never exceeded gen-A-only $afterA")
      assert(fin <= 21,
        s"state must shrink to the live window (gen B + flush): $fin rows (peak $peak)")
      assert(fin < peak, s"no eviction observed: final $fin vs peak $peak")
      // and the evicted groups were EMITTED, not dropped
      val emitted = s.table("incdedup_state").count()
      assert(emitted >= 20, s"gen A decisions must have been emitted: $emitted")
    } finally q.stop()
  }

  // The two USERS-keyed twins (VERDICT r10 #5): first-ever semantics
  // retains state forever by design (the honest minimum), so the 100 TB
  // property to assert is the BOUND — state rows track DISTINCT users,
  // not events: replaying more events for known users must not grow
  // state, and k new users grow it by exactly k.

  test("firstSeenStream: state rows = distinct users, not events") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[FsEv]
    val q = Streams.firstSeenStream(input.toDF())
      .writeStream.format("memory").queryName("firstseen_state")
      .outputMode("append").start()
    def ev(u: Long, i: Long) =
      FsEv(u, u * 100 + i, Timestamp.valueOf(s"2024-01-01 10:0$i:00"), "view")
    try {
      // 3 users × 3 events
      input.addData((for (u <- 1L to 3L; i <- 0L until 3L) yield ev(u, i)): _*)
      q.processAllAvailable()
      val (afterA, _) = stateRows(q)
      assert(afterA == 3, s"state must be users-sized after 9 events / 3 users: $afterA")
      // same 3 users re-appear (6 more events) + 2 new users
      input.addData(
        (for (u <- 1L to 3L; i <- 3L until 5L) yield ev(u, i)) ++
          (for (u <- 4L to 5L; i <- 0L until 2L) yield ev(u, i)): _*)
      q.processAllAvailable()
      val (fin, peak) = stateRows(q)
      assert(fin == 5, s"state must be 5 (distinct users) after 19 events: $fin")
      assert(peak == 5, s"state never exceeds distinct users: peak $peak")
    } finally q.stop()
  }

  test("twapStream: (user, day) state evicts when the watermark closes the day") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[UpEv]
    val q = Streams.twapStream(input.toDF(), lateness = "1 hour")
      .writeStream.format("memory").queryName("twap_state")
      .outputMode("append").start()
    def ev(u: Long, i: Long, t: String) =
      UpEv(u, u * 100 + i, Timestamp.valueOf(t), "view", i.toDouble)
    try {
      // day 1: 5 users × 2 events → 5 live (user, day) keys
      input.addData((for (u <- 1L to 5L; i <- 0L to 1L)
        yield ev(u, i, s"2024-01-01 0$i:00:00")): _*)
      q.processAllAvailable()
      val (afterA, _) = stateRows(q)
      assert(afterA == 5, s"day-1 keys: $afterA")
      // day 3 events for 3 users: the watermark (max ts − 1 h) passes
      // day 1's end, so all five day-1 states finalize (emit) + remove
      input.addData((for (u <- 1L to 3L; i <- 0L to 1L)
        yield ev(u, 10 + i, s"2024-01-03 1$i:00:00")): _*)
      q.processAllAvailable()
      val (fin, peak) = stateRows(q)
      assert(peak >= 8, s"both generations never coexisted: peak $peak")
      assert(fin <= 3, s"day-1 state must evict at the watermark: $fin rows")
      assert(fin < peak, s"no eviction observed: $fin vs $peak")
      // and the evicted days were EMITTED (finalize-on-watermark)
      assert(s.table("twap_state").count() == 5)
    } finally q.stop()
  }

  test("fold streams (ewma, attribution, cusum): state rows = distinct keys, not events") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    def ev(u: Long, i: Long, tp: String) =
      UpEv(u, u * 100 + i, Timestamp.valueOf(s"2024-01-01 10:0$i:00"), tp, i.toDouble + 1)

    def drive(name: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_],
        batch1: Seq[UpEv], batch2: Seq[UpEv], want1: Long, want2: Long): Unit = {
      val input = MemoryStream[UpEv]
      val q = mk(input.toDF())
        .writeStream.format("memory").queryName(s"${name}_state")
        .outputMode("append").start()
      try {
        input.addData(batch1: _*); q.processAllAvailable()
        val (a, _) = stateRows(q)
        assert(a == want1, s"$name after batch1: $a (want $want1)")
        input.addData(batch2: _*); q.processAllAvailable()
        val (fin, peak) = stateRows(q)
        assert(fin == want2 && peak == want2,
          s"$name state must stay keys-sized: fin $fin peak $peak (want $want2)")
      } finally q.stop()
    }

    // ewma: users-keyed — 3 users × 3 events → 3; replays + 2 new → 5
    drive("ewma", df => Streams.ewmaStream(df),
      for (u <- 1L to 3L; i <- 0L until 3L) yield ev(u, i, "view"),
      (for (u <- 1L to 3L; i <- 3L until 5L) yield ev(u, i, "view")) ++
        (for (u <- 4L to 5L; i <- 0L until 2L) yield ev(u, i, "view")),
      3, 5)
    // attribution: users-keyed (a non-purchase touch sets the state)
    drive("attr", df => Streams.attributionStream(df),
      for (u <- 1L to 3L; i <- 0L until 3L) yield ev(u, i, "view"),
      (for (u <- 1L to 3L; i <- 3L until 5L) yield ev(u, i, "click")) ++
        (for (u <- 4L to 5L; i <- 0L until 2L) yield ev(u, i, "view")),
      3, 5)
    // cusum: event_type-keyed — 2 types × 4 events → 2; + 1 new type → 3
    drive("cusum", df => Streams.cusumStream(df, mu0 = 100.0),
      for (tp <- Seq("view", "click"); i <- 0L until 4L) yield ev(1L + i, i, tp),
      (for (tp <- Seq("view", "click"); i <- 4L until 6L) yield ev(1L + i, i, tp)) ++
        (for (i <- 0L until 2L) yield ev(9L + i, i, "purchase")),
      2, 3)
  }

  test("upsertStream: state rows = distinct users, not events") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[UpEv]
    val q = Streams.upsertStream(input.toDF())
      .writeStream.format("memory").queryName("upsert_state")
      .outputMode("update").start()
    def ev(u: Long, i: Long) =
      UpEv(u, u * 100 + i, Timestamp.valueOf(s"2024-01-01 10:0$i:00"), "view", i.toDouble)
    try {
      // 2 users × 4 events
      input.addData((for (u <- 1L to 2L; i <- 0L until 4L) yield ev(u, i)): _*)
      q.processAllAvailable()
      val (afterA, _) = stateRows(q)
      assert(afterA == 2, s"state must be users-sized after 8 events / 2 users: $afterA")
      // same 2 users again + 3 new users
      input.addData(
        (for (u <- 1L to 2L; i <- 4L until 6L) yield ev(u, i)) ++
          (for (u <- 3L to 5L; i <- 0L until 2L) yield ev(u, i)): _*)
      q.processAllAvailable()
      val (fin, peak) = stateRows(q)
      assert(fin == 5, s"state must be 5 (distinct users) after 18 events: $fin")
      assert(peak == 5, s"state never exceeds distinct users: peak $peak")
    } finally q.stop()
  }
}

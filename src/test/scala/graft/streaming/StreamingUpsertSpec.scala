package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

// Top-level for encoder codegen (see StreamsSpec note).
case class UpEv(user_id: Long, event_id: Long, ts: Timestamp,
    event_type: String, value: Double)

/** upsertStream ≡ batch q94 keep-latest over the replayed history, with
  * the CDC emission contract: no output for losing (stale) rows, and
  * per-key emissions strictly monotone in (ts, event_id) — so the final
  * materialized table is reconstructable order-independently as the
  * per-key max emission.
  */
class StreamingUpsertSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Full-microsecond emission key — the q94 ordering. The spec's own
    * reconstruction must NOT use `.getTime` (millisecond truncation):
    * the same-millisecond fixture below exists precisely to catch that.
    */
  private def usKey(r: UpEv): (Long, Long) = (TestTime.micros(r.ts), r.event_id)

  private val batch1 = Seq(
    UpEv(1, 10, ts("2024-01-01 10:00:00"), "click", 1.0),
    UpEv(2, 11, ts("2024-01-01 10:05:00"), "view", 2.0),
    UpEv(1, 12, ts("2024-01-01 10:10:00"), "click", 3.0))
  private val batch2 = Seq(
    // stale for user 1 (older ts than event 12) — must NOT emit
    UpEv(1, 13, ts("2024-01-01 09:00:00"), "error", 4.0),
    // newer for user 2 — must emit
    UpEv(2, 14, ts("2024-01-01 11:00:00"), "click", 5.0),
    // new key
    UpEv(3, 15, ts("2024-01-01 10:30:00"), "view", 6.0))
  private val batch3 = Seq(
    // ts tie with event 12, higher event_id wins (q94 tie rule)
    UpEv(1, 16, ts("2024-01-01 10:10:00"), "view", 7.0),
    // exact current winner replayed for user 3 — no change, no emit
    UpEv(3, 15, ts("2024-01-01 10:30:00"), "view", 6.0))
  private val batch4 = Seq(
    // ADVERSARIAL same-millisecond pair (VERDICT r10 #1): two events
    // 500 µs apart inside millisecond 10:00:00.000 whose event_id
    // order INVERTS their microsecond order. Batch q94 ranks by full-
    // precision ts DESC, event_id DESC → event 21 (the later .000900)
    // wins; a millisecond state key sees equal ts and picks the higher
    // event_id 22 — the exact defect at the old Streams.scala:684.
    UpEv(5, 22, ts("2024-01-01 10:00:00.000400"), "view", 8.0),
    UpEv(5, 21, ts("2024-01-01 10:00:00.000900"), "click", 9.0))

  test("upsertStream materializes batch q94 keep-latest; stale rows emit nothing") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[UpEv]
    val q = Streams.upsertStream(input.toDF())
      .writeStream.format("memory").queryName("upsert")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val afterB2 = s.table("upsert").collect().length
      input.addData(batch3: _*); q.processAllAvailable()
      val afterB3 = s.table("upsert").collect().length
      input.addData(batch4: _*); q.processAllAvailable()
      val emitted = s.table("upsert")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .as[UpEv].collect().toSeq

      // batch q94 over the full replayed history
      val all = (batch1 ++ batch2 ++ batch3 ++ batch4).toDS().toDF()
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val expected = all.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .as[UpEv].collect().map(e => e.user_id -> e).toMap

      // final state = per-key max (ts, event_id) emission, microsecond-keyed
      val finalState = emitted.groupBy(_.user_id)
        .map { case (u, rs) => u -> rs.maxBy(usKey) }
      assert(finalState == expected)

      // per-key emissions strictly monotone in (ts, event_id)
      emitted.groupBy(_.user_id).values.foreach { rs =>
        val keys = rs.map(usKey)
        assert(keys.distinct.length == keys.length, s"duplicate emission keys: $rs")
      }
      // batch3: exactly ONE new emission (user 1's tie-break winner);
      // user 3's identical replay and nothing else may emit
      assert(afterB3 == afterB2 + 1)
      // user 1's winner is the tie-broken event 16, emitted in batch 3
      assert(finalState(1L).event_id == 16L)
      // the same-millisecond pair: the microsecond-later event 21 must
      // be user 5's kept row (batch q94 parity), not the higher
      // event_id of the shared millisecond
      assert(finalState(5L).event_id == 21L,
        s"millisecond-truncated state key kept ${finalState(5L)}")
    } finally q.stop()
  }

  test("sf0.001 fixture replay: reconstructed upsert table equals batch q94") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val dir = "/root/testdata/sf0.001"
    // chronological replay at FULL microsecond precision — the fixture
    // carries sub-millisecond timestamps, which is exactly where the
    // old getTime state key diverged from batch q94
    val rows = graft.Tables.events(s, dir)
      .selectExpr("user_id", "event_id", "ts", "event_type", "value")
      .as[UpEv].collect().toSeq.sortBy(usKey)
    val batch = graft.SparkEntry.queries("q94_keep_latest")(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .as[UpEv].collect().map(e => e.user_id -> e.event_id).toMap
    // non-vacuous: keep-latest must actually drop rows
    assert(batch.nonEmpty && rows.length > batch.size)

    val input = MemoryStream[UpEv]
    val q = Streams.upsertStream(input.toDF())
      .writeStream.format("memory").queryName("upsert_fixture")
      .outputMode("update").start()
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        input.addData(c.toSeq: _*); q.processAllAvailable()
      }
      val emitted = s.table("upsert_fixture")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .as[UpEv].collect().toSeq
      emitted.groupBy(_.user_id).values.foreach { rs =>
        val keys = rs.map(usKey)
        assert(keys.distinct.length == keys.length, s"duplicate emissions: $rs")
      }
      val finalState = emitted.groupBy(_.user_id)
        .map { case (u, rs) => u -> rs.maxBy(usKey).event_id }
      assert(finalState == batch,
        s"replayed upsert table diverges from batch q94 on " +
          s"${finalState.toSet.diff(batch.toSet).take(5)}")
    } finally q.stop()
  }

  test("checkpointed restart: keep-latest state survives, stale rows stay silent after recovery") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_upsert")
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    // Update-mode emissions land via foreachBatch → append parquet
    // (the CDC-consumer shape; the file sink proper is append-only).
    // Clean stop between epochs → every emission appended exactly once.
    def startQuery() =
      Streams.upsertStream(
        s.readStream
          .schema("user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
          .parquet(in))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streams.LatestRow], _: Long) =>
          batch.write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()

    def land(evs: UpEv*): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(in)

    try {
      // epoch 1: two users
      land(
        UpEv(1, 10, ts("2024-01-01 10:00:00"), "click", 1.0),
        UpEv(2, 11, ts("2024-01-01 10:05:00"), "view", 2.0))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()

      // lands while DOWN: a STALE row for user 1 (older than the kept
      // winner — must emit nothing, which requires the recovered
      // state) and a new user 3
      land(
        UpEv(1, 12, ts("2024-01-01 09:00:00"), "error", 3.0),
        UpEv(3, 13, ts("2024-01-01 10:30:00"), "view", 4.0))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      // epoch 3 after a second restart: a genuinely newer row for
      // user 1 — must emit
      land(UpEv(1, 14, ts("2024-01-01 11:00:00"), "purchase", 5.0))
      val q3 = startQuery()
      try q3.processAllAvailable() finally q3.stop()

      val emitted = s.read.parquet(out)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .as[UpEv].collect().toSeq
      // exactly-once across restarts: no duplicate emission keys
      assert(emitted.map(e => (e.user_id, usKey(e))).distinct.length == emitted.length,
        s"restart duplicated emissions: $emitted")
      // the stale row emitted nothing: user 1 has exactly its epoch-1
      // and epoch-3 winners
      assert(emitted.filter(_.user_id == 1L).map(_.event_id).sorted == Seq(10L, 14L),
        s"stale row leaked through restart: $emitted")
      // reconstructed final state = batch q94 over the full history
      val finalState = emitted.groupBy(_.user_id)
        .map { case (u, rs) => u -> rs.maxBy(usKey).event_id }
      assert(finalState == Map(1L -> 14L, 2L -> 11L, 3L -> 13L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively(): Unit
    }
  }
}

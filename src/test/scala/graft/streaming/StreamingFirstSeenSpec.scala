package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

// Top-level for encoder codegen (see StreamsSpec note).
case class FsEv(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

/** firstSeenStream ≡ batch q158's new-user attribution on a replayed
  * log: one emission per user ever (even when the user re-appears in
  * later micro-batches), carrying the user's true min-(ts, event_id)
  * first event — INDEPENDENT of arrival order within a micro-batch
  * (VERDICT r10 #4: the old dropDuplicates formulation kept whichever
  * row the shuffle delivered first, so a user whose day-1 and day-2
  * events shared a batch could be attributed to day 2). The per-day
  * rollup of emissions equals the batch new_users-per-day frame.
  */
class StreamingFirstSeenSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def usKey(e: FsEv): (Long, Long) = (TestTime.micros(e.ts), e.event_id)

  private val batch1 = Seq(
    FsEv(1, 10, ts("2024-01-01 09:00:00"), "view"),
    FsEv(1, 11, ts("2024-01-01 09:05:00"), "click"), // same batch repeat — swallowed
    FsEv(2, 12, ts("2024-01-01 10:00:00"), "view"))
  private val batch2 = Seq(
    FsEv(1, 13, ts("2024-01-02 08:00:00"), "view"), // returning — swallowed
    FsEv(3, 14, ts("2024-01-02 09:00:00"), "signup"))
  private val batch3 = Seq(
    FsEv(2, 15, ts("2024-01-03 11:00:00"), "purchase"), // returning — swallowed
    FsEv(4, 16, ts("2024-01-03 12:00:00"), "view"),
    FsEv(4, 17, ts("2024-01-03 12:30:00"), "view")) // same batch repeat
  private val batch4 = Seq(
    // ADVERSARIAL arrival order: new user 7's day-2 event ARRIVES
    // before its day-1 event in the same micro-batch (out-of-order
    // ingest — the multi-partition race made deterministic). The
    // attribution must still be day 1: batch q158 takes min(ts), not
    // first-arrival.
    FsEv(7, 31, ts("2024-01-05 09:00:00"), "view"),
    FsEv(7, 30, ts("2024-01-04 22:00:00"), "signup"),
    // tie case: same timestamp, lower event_id wins (the q94-family
    // deterministic tie rule)
    FsEv(8, 41, ts("2024-01-05 10:00:00"), "click"),
    FsEv(8, 40, ts("2024-01-05 10:00:00"), "view"))

  test("firstSeenStream emits each user once with the true min-(ts,event_id) event; day rollup = batch new_users") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[FsEv]
    val q = Streams.firstSeenStream(input.toDF())
      .writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
      input.addData(batch4: _*); q.processAllAvailable()
      val emitted = s.table("first_seen")
        .select(col("user_id"), col("first_ts"), col("first_day").cast("string"))
        .as[(Long, Timestamp, String)].collect().toSeq

      // exactly once per user
      assert(emitted.map(_._1).sorted == Seq(1L, 2L, 3L, 4L, 7L, 8L))

      // each emission is the user's true earliest event of the history,
      // min-(ts, event_id) — NOT first-arrival within the batch
      val all = batch1 ++ batch2 ++ batch3 ++ batch4
      val expectedFirst = all.groupBy(_.user_id)
        .map { case (u, es) => u -> es.minBy(usKey).ts }
      emitted.foreach { case (u, t, _) => assert(t == expectedFirst(u), s"user $u") }

      // the out-of-order user lands on day 1 of its history
      assert(emitted.find(_._1 == 7L).get._3 == "2024-01-04")

      // per-day rollup of emissions = batch q158 new_users frame
      val got = emitted.groupBy(_._3).map { case (d, rs) => d -> rs.size.toLong }
      val expected = all.toDS().toDF()
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("fd"))
        .groupBy(col("fd").cast("string")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("sf0.001 fixture replay: day rollup of emissions equals batch q158 new_users") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.events(s, dir)
      .selectExpr("user_id", "event_id", "ts", "event_type")
      .as[FsEv].collect().toSeq.sortBy(usKey)
    // batch q158's per-day new-user counts (days with 0 new users are
    // returning-only days — the stream emits nothing for them)
    val batch = graft.SparkEntry.queries("q158_new_vs_returning")(s, dir)
      .select(col("d"), col("new_users"))
      .as[(String, Long)].collect().filter(_._2 > 0).toMap
    assert(batch.nonEmpty && batch.values.sum < rows.length)

    val input = MemoryStream[FsEv]
    val q = Streams.firstSeenStream(input.toDF())
      .writeStream.format("memory").queryName("firstseen_fixture")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        input.addData(c.toSeq: _*); q.processAllAvailable()
      }
      val emitted = s.table("firstseen_fixture")
        .select(col("user_id"), col("first_ts"), col("first_day").cast("string"))
        .as[(Long, Timestamp, String)].collect().toSeq
      // exactly once per user, and the emission is the user's true
      // min-(ts, event_id) event of the whole fixture
      val byUser = rows.groupBy(_.user_id)
      assert(emitted.map(_._1).sorted == byUser.keys.toSeq.sorted)
      emitted.foreach { case (u, t, _) =>
        assert(t == byUser(u).minBy(usKey).ts, s"user $u first_ts") }
      // per-day rollup = batch q158 new_users
      val got = emitted.groupBy(_._3).map { case (d, rs) => d -> rs.size.toLong }
      assert(got == batch,
        s"day rollup diverges: ${got.toSet.diff(batch.toSet).take(5)}")
    } finally q.stop()
  }

  test("checkpointed restart: seen-users state survives, emissions stay exactly-once-per-user") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_firstseen")
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    def startQuery() =
      Streams.firstSeenStream(
        s.readStream
          .schema("user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING")
          .parquet(in))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    def land(evs: FsEv*): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(in)

    try {
      // epoch 1: users 1 (twice) and 2
      land(
        FsEv(1, 10, ts("2024-01-01 09:00:00"), "view"),
        FsEv(1, 11, ts("2024-01-01 09:30:00"), "click"),
        FsEv(2, 12, ts("2024-01-01 10:00:00"), "view"))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()

      // lands while the query is DOWN: user 1 re-appears (must be
      // swallowed — only if the seen-set state was recovered), user 3
      // is new
      land(
        FsEv(1, 13, ts("2024-01-02 08:00:00"), "view"),
        FsEv(3, 14, ts("2024-01-02 09:00:00"), "signup"))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      // epoch 3 after a second restart: user 2 re-appears; new user 4
      // arrives out of order (day-2 row first in the file)
      land(
        FsEv(2, 15, ts("2024-01-03 11:00:00"), "purchase"),
        FsEv(4, 17, ts("2024-01-03 12:00:00"), "view"),
        FsEv(4, 16, ts("2024-01-02 23:00:00"), "view"))
      val q3 = startQuery()
      try q3.processAllAvailable() finally q3.stop()

      val rows = s.read.parquet(out)
        .select(col("user_id"), col("first_day").cast("string"))
        .as[(Long, String)].collect().toSeq.sorted
      assert(rows == Seq(
        1L -> "2024-01-01", 2L -> "2024-01-01",
        3L -> "2024-01-02", 4L -> "2024-01-02"),
        s"restart broke first-seen state: $rows")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively(): Unit
    }
  }
}

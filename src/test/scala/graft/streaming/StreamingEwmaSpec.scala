package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** ewmaStream == the sequential recursion exactly, across micro-batch
  * boundaries and unsorted within-batch delivery; and the recursion it
  * computes is the same filter batch q185 truncates — so past q185's
  * 16-lag warm-up the two stay within the (3/4)^16 truncation budget.
  */
class StreamingEwmaSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // two users, interleaved, values chosen to swing hard so truncation
  // error would be visible if the recursion were wrong
  private val history: Seq[Streams.LatestRow] = (0 until 40).flatMap { i =>
    Seq(
      Streams.LatestRow(1, 100 + i, ts(f"2024-01-01 10:${i % 60}%02d:00"), "view",
        if (i % 2 == 0) 400.0 else 10.0),
      Streams.LatestRow(2, 500 + i, ts(f"2024-01-01 11:${i % 60}%02d:00"), "view",
        i * 5.0))
  }

  test("ewmaStream == sequential recursion; bounded vs batch q185's truncated form") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Streams.LatestRow]
    val q = Streams.ewmaStream(input.toDF())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    try {
      // 3 batches; the middle one delivered in reverse order
      val (b1, rest) = history.splitAt(30)
      val (b2, b3) = rest.splitAt(30)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2.reverse: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val got = s.table("ewma_stream")
        .select("event_id", "ewma")
        .as[(Long, Double)].collect().toMap

      // witness: plain sequential recursion per user
      val expected = history.groupBy(_.user_id).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (TestTime.micros(e.ts), e.event_id))
        var y = Double.NaN
        sorted.map { e =>
          y = if (y.isNaN) e.value else 0.25 * e.value + 0.75 * y
          e.event_id -> y
        }
      }
      assert(got.size == history.size)
      for ((id, exp) <- expected)
        assert(math.abs(got(id) - exp) <= 1e-12, s"event $id: ${got(id)} vs $exp")

      // cross-check vs q185's truncated form: recompute the truncated
      // window estimate for user 1's tail and assert the documented
      // (3/4)^16-scale bound against the exact stream values
      val w16 = Iterator.iterate(1.0)(_ * 0.75).take(16).toSeq
      val u1 = history.filter(_.user_id == 1).sortBy(e => (TestTime.micros(e.ts), e.event_id))
      for (i <- 16 until u1.length) {
        val lags = (0 to 15).map(k => u1(i - k).value)
        val trunc = lags.zip(w16).map { case (x, w) => w * x }.sum / w16.sum
        assert(math.abs(got(u1(i).event_id) - trunc) <= 15.0,
          s"truncated form drifted from the exact stream at idx $i")
      }
    } finally q.stop()
  }

  test("same-millisecond events process in MICROSECOND order, not event_id order") {
    // two events 400µs apart inside the same millisecond, with the
    // LOWER event_id arriving LATER in microseconds — a getTime-based
    // sort (millis) would tie and fall back to event_id, processing
    // them backwards (the r9 advice finding). Batch q185 orders by
    // full-precision ts, so the stream must too.
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val rows = Seq(
      Streams.LatestRow(7, 902, ts("2024-01-01 10:00:00.000100"), "view", 100.0),
      Streams.LatestRow(7, 901, ts("2024-01-01 10:00:00.000500"), "view", 200.0))
    val input = MemoryStream[Streams.LatestRow]
    val q = Streams.ewmaStream(input.toDF())
      .writeStream.format("memory").queryName("ewma_us")
      .outputMode("append").start()
    try {
      // delivered in event_id order — the WRONG processing order
      input.addData(rows.sortBy(_.event_id): _*); q.processAllAvailable()
      val got = s.table("ewma_us").select("event_id", "ewma")
        .as[(Long, Double)].collect().toMap
      // microsecond order: 902 first (y=100), then 901 (0.25*200+0.75*100)
      assert(got(902) == 100.0, s"first-in-time event must seed: ${got(902)}")
      assert(math.abs(got(901) - 125.0) <= 1e-12,
        s"getTime(millis) ordering would give 175.0; got ${got(901)}")
    } finally q.stop()
  }

  test("a NaN observation poisons the filter like the batch recursion — no silent restart") {
    // batch q185's y' = αx + (1−α)y propagates a NaN input forever; a
    // NaN-as-uninitialized-sentinel formulation instead RESTARTS the
    // filter from the next value (discarding the key's history) and
    // skips the state write — both silently. The third emission must
    // be NaN, not a fresh seed of 5.0.
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val rows = Seq(
      Streams.LatestRow(11, 1, ts("2024-01-01 10:00:00"), "view", 1.0),
      Streams.LatestRow(11, 2, ts("2024-01-01 10:01:00"), "view", Double.NaN),
      Streams.LatestRow(11, 3, ts("2024-01-01 10:02:00"), "view", 5.0))
    val input = MemoryStream[Streams.LatestRow]
    val q = Streams.ewmaStream(input.toDF())
      .writeStream.format("memory").queryName("ewma_nan")
      .outputMode("append").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      val got = s.table("ewma_nan").select("event_id", "ewma")
        .as[(Long, Double)].collect().toMap
      assert(got(1L) == 1.0)
      assert(got(2L).isNaN, s"NaN input must surface as NaN: ${got(2L)}")
      assert(got(3L).isNaN,
        s"NaN sentinel would silently restart the filter at 5.0: ${got(3L)}")
    } finally q.stop()
  }
}

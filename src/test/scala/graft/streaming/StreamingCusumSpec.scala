package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** cusumStream == the sequential one-sided Page recursion exactly —
  * across micro-batch boundaries, unsorted within-batch delivery, and
  * same-millisecond microsecond ordering — including the alarm-reset
  * semantics (s restarts at 0 after a crossing). The batch q207
  * statistic is retrospective (argmax over the finished path); this is
  * the live detector, so the witness is the recursion itself, the
  * ewmaStream pattern.
  */
class StreamingCusumSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // two keyed series: "click" drifts upward mid-series (values jump
  // from ~muO to mu0+8, forcing an alarm + reset), "view" stays at the
  // reference level (s hovers near 0, never alarms)
  private val mu0 = 10.0
  private val history: Seq[Streams.LatestRow] = (0 until 30).flatMap { i =>
    Seq(
      Streams.LatestRow(1, 100 + i, ts(f"2024-01-01 10:${i}%02d:00"), "click",
        if (i < 15) 10.0 + (if (i % 2 == 0) 1.0 else -1.0) else 18.0),
      Streams.LatestRow(2, 500 + i, ts(f"2024-01-01 11:${i}%02d:00"), "view",
        10.0 + (if (i % 3 == 0) 0.5 else -0.25)))
  }

  test("cusumStream == sequential Page recursion with alarm resets") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Streams.LatestRow]
    val q = Streams.cusumStream(input.toDF(), mu0 = mu0, slack = 1.0, h = 20.0)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      // 3 batches, middle one delivered in reverse order
      val (b1, rest) = history.splitAt(20)
      val (b2, b3) = rest.splitAt(20)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2.reverse: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val got = s.table("cusum_stream")
        .select("event_id", "s", "alarm")
        .as[(Long, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

      // witness: the plain sequential recursion per type
      val expected = history.groupBy(_.event_type).flatMap { case (_, evs) =>
        var acc = 0.0
        evs.sortBy(e => (TestTime.micros(e.ts), e.event_id)).map { e =>
          acc = math.max(0.0, acc + (e.value - mu0 - 1.0))
          val alarm = acc > 20.0
          val row = e.event_id -> ((acc, alarm))
          if (alarm) acc = 0.0
          row
        }
      }
      assert(got.size == history.size)
      for ((id, (expS, expA)) <- expected) {
        assert(math.abs(got(id)._1 - expS) <= 1e-12, s"event $id: ${got(id)} vs $expS")
        assert(got(id)._2 == expA, s"event $id alarm: ${got(id)} vs $expA")
      }
      // non-vacuous: the drifting series must actually alarm (and thus
      // exercise the reset), the in-control series must never
      val clickAlarms = history.filter(_.event_type == "click")
        .count(e => got(e.event_id)._2)
      val viewAlarms = history.filter(_.event_type == "view")
        .count(e => got(e.event_id)._2)
      assert(clickAlarms >= 2, s"drift series must alarm repeatedly: $clickAlarms")
      assert(viewAlarms == 0, s"in-control series must not alarm: $viewAlarms")
    } finally q.stop()
  }

  test("same-millisecond events process in microsecond order") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    // lower event_id arrives LATER within one millisecond: the big
    // value must fold FIRST (alarm + reset), then the small one
    val rows = Seq(
      Streams.LatestRow(7, 902, ts("2024-01-01 10:00:00.000100"), "buy", 40.0),
      Streams.LatestRow(7, 901, ts("2024-01-01 10:00:00.000500"), "buy", 11.0))
    val input = MemoryStream[Streams.LatestRow]
    val q = Streams.cusumStream(input.toDF(), mu0 = 10.0, slack = 0.0, h = 20.0)
      .writeStream.format("memory").queryName("cusum_us")
      .outputMode("append").start()
    try {
      input.addData(rows.sortBy(_.event_id): _*); q.processAllAvailable()
      val got = s.table("cusum_us").select("event_id", "s", "alarm")
        .as[(Long, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      // time order: 902 first (s=30, alarm, reset), then 901 (s=1)
      assert(got(902) == ((30.0, true)), s"getTime ordering would differ: $got")
      assert(got(901) == ((1.0, false)), s"getTime ordering would give (31,true): $got")
    } finally q.stop()
  }
}

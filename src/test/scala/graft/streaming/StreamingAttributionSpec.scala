package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** attributionStream ≡ batch q186 last-touch attribution on a
  * chronologically replayed log: every purchase emits exactly once, in
  * the batch it arrives, credited to the user's most recent preceding
  * non-purchase/non-error touch — across micro-batch boundaries, within
  * a single batch (unsorted iterator), and 'direct' for first-touch
  * purchases.
  */
class StreamingAttributionSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Streams.LatestRow(1, 10, ts("2024-01-01 09:00:00"), "click", 0.0),
    // same-batch purchase AFTER the click (delivered out of order below)
    Streams.LatestRow(1, 12, ts("2024-01-01 09:30:00"), "purchase", 50.0),
    Streams.LatestRow(2, 11, ts("2024-01-01 09:10:00"), "purchase", 20.0)) // first touch → direct
  private val batch2 = Seq(
    Streams.LatestRow(1, 13, ts("2024-01-01 10:00:00"), "view", 0.0),
    Streams.LatestRow(1, 14, ts("2024-01-01 10:05:00"), "error", 0.0), // must NOT become the channel
    Streams.LatestRow(2, 15, ts("2024-01-01 10:10:00"), "signup", 0.0))
  private val batch3 = Seq(
    Streams.LatestRow(1, 16, ts("2024-01-01 11:00:00"), "purchase", 30.0), // view (carried from b2)
    Streams.LatestRow(2, 17, ts("2024-01-01 11:05:00"), "purchase", 40.0)) // signup

  test("attributionStream ≡ batch q186 attribution on chronological replay") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Streams.LatestRow]
    // deliver batch1 deliberately out of (ts, event_id) order: the
    // handler must sort within the batch
    val q = Streams.attributionStream(input.toDF())
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      input.addData(batch1.reverse: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
      val emitted = s.table("attr")
        .select("user_id", "event_id", "channel", "value")
        .as[(Long, Long, String, Double)].collect().toSeq.sortBy(_._2)

      // batch q186 over the full replayed history
      val all = (batch1 ++ batch2 ++ batch3).toDS().toDF()
      val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val expected = all
        .withColumn("tag",
          when(!col("event_type").isin("purchase", "error"), col("event_type")))
        .withColumn("channel",
          coalesce(last(col("tag"), ignoreNulls = true).over(win), lit("direct")))
        .filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "channel", "value")
        .as[(Long, Long, String, Double)].collect().toSeq.sortBy(_._2)

      assert(emitted == expected)
      // and the concrete credits are what the scenario says they are
      assert(emitted.map(e => e._2 -> e._3).toMap ==
        Map(12L -> "click", 11L -> "direct", 16L -> "view", 17L -> "signup"))
    } finally q.stop()
  }

  test("same-millisecond touch/purchase resolve in MICROSECOND order") {
    // purchase at .000100, click at .000500 — in the SAME millisecond,
    // with the click carrying the lower event_id. True time order:
    // purchase first → 'direct'. A getTime(millis) sort would tie and
    // process the click first by event_id, mis-crediting the purchase
    // (the r9 advice finding).
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val rows = Seq(
      Streams.LatestRow(9, 901, ts("2024-01-01 09:00:00.000500"), "click", 0.0),
      Streams.LatestRow(9, 902, ts("2024-01-01 09:00:00.000100"), "purchase", 10.0))
    val input = MemoryStream[Streams.LatestRow]
    val q = Streams.attributionStream(input.toDF())
      .writeStream.format("memory").queryName("attr_us")
      .outputMode("append").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      val got = s.table("attr_us").select("event_id", "channel")
        .as[(Long, String)].collect().toMap
      assert(got == Map(902L -> "direct"),
        s"millis ordering would credit 'click'; got $got")
    } finally q.stop()
  }

  test("a literal 'direct' touch overwrites the stored channel across batches") {
    // 'direct' is the UNSET default, but it is also a legal
    // event_type. A formulation that skips the state write when
    // channel == "direct" can never replace a stored 'view' with a
    // genuine newer 'direct' touch, so the later purchase would be
    // credited to the stale 'view' — batch q186's LAST_VALUE credits
    // 'direct'.
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Streams.LatestRow]
    val q = Streams.attributionStream(input.toDF())
      .writeStream.format("memory").queryName("attr_direct")
      .outputMode("append").start()
    try {
      input.addData(Streams.LatestRow(8, 801, ts("2024-01-01 09:00:00"), "view", 0.0))
      q.processAllAvailable()
      input.addData(Streams.LatestRow(8, 802, ts("2024-01-01 10:00:00"), "direct", 0.0))
      q.processAllAvailable()
      input.addData(Streams.LatestRow(8, 803, ts("2024-01-01 11:00:00"), "purchase", 25.0))
      q.processAllAvailable()
      val got = s.table("attr_direct").select("event_id", "channel")
        .as[(Long, String)].collect().toMap
      assert(got == Map(803L -> "direct"),
        s"stale stored channel survived a newer 'direct' touch: $got")
    } finally q.stop()
  }
}

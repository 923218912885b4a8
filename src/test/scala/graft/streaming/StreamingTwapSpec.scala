package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

/** Streaming TWAP ≡ batch q157 (the DuckDB-oracle-gated query) on the
  * chronologically replayed fixture, with finalize-on-watermark: a
  * (user, day) row may only emit once the watermark passes its day.
  */
class StreamingTwapSpec extends SparkSpec {

  test("streaming TWAP over the sf0.001 fixture equals batch q157") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val dir = "/root/testdata/sf0.001"

    val batch = graft.SparkEntry.queries("q157_twap")(s, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap

    val rows = graft.Tables.events(s, dir)
      .selectExpr("ts", "user_id", "event_id", "value").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (TestTime.micros(r._1), r._3))

    val input = MemoryStream[(Timestamp, Long, Long, Double)]
    val q = Streams.twapStream(
      input.toDF().toDF("ts", "user_id", "event_id", "value"))
      .writeStream.format("memory").queryName("twap_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { c =>
        input.addData(c.toSeq: _*); q.processAllAvailable()
      }
      // sentinel far ahead of every fixture day: advances the
      // watermark past all day-ends; timeouts fire on the batch AFTER
      // the watermark moves, so drive two more batches
      val sentinelTs = new Timestamp(rows.map(_._1.getTime).max + 3L * 86400000L)
      input.addData((sentinelTs, 999999L, 0L, 0.0))
      q.processAllAvailable()
      input.addData((new Timestamp(sentinelTs.getTime + 1000L), 999999L, 1L, 0.0))
      q.processAllAvailable()

      val got = s.table("twap_stream")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
        .toMap
        .filter { case ((uid, _), _) => uid != 999999L }

      assert(batch.nonEmpty && batch.exists(_._2._2.isDefined),
        "vacuous: batch q157 has no weighted day")
      assert(got.keySet == batch.keySet,
        s"key sets differ: missing=${batch.keySet -- got.keySet} extra=${got.keySet -- batch.keySet}")
      for ((k, (n, tw)) <- batch) {
        val (gn, gtw) = got(k)
        assert(gn == n, s"$k: n_events $gn vs $n")
        (tw, gtw) match {
          case (None, None) => ()
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6, s"$k: $b vs $a")
          case other => fail(s"$k: twap nullability differs: $other")
        }
      }
    } finally q.stop()
  }

  test("a 6dp rounding tie resolves HALF_UP exactly like batch round(x, 6)") {
    // One interval of 2^23 µs at v = 0.1234565 (duration a power of
    // two, so (v·dur)/dur is bit-exact): raw twap = the double nearest
    // 0.1234565, whose toString is "0.1234565" — Spark's round(x, 6)
    // (BigDecimal-of-toString, HALF_UP) gives 0.123457, while a
    // math.rint formulation rounds the BINARY value (≈123456.49999…)
    // half-to-even down to 0.123456. This pins the batch-q157
    // convention on the exact tie the fixture never exercises.
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, Double)]
    val q = Streams.twapStream(
      input.toDF().toDF("ts", "user_id", "event_id", "value"))
      .writeStream.format("memory").queryName("twap_tie")
      .outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 09:00:00"), 5L, 1L, 0.1234565),
        (Timestamp.valueOf("2024-01-01 09:00:08.388608"), 5L, 2L, 9.9))
      q.processAllAvailable()
      // sentinel two days out, twice: advance the watermark past the
      // day end, then fire the timeout on the following batch
      input.addData((Timestamp.valueOf("2024-01-03 09:00:00"), 999L, 3L, 0.0))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-03 09:00:01"), 999L, 4L, 0.0))
      q.processAllAvailable()
      val tw = s.table("twap_tie")
        .filter(col("user_id") === 5L)
        .select("twap").as[Option[Double]].collect()
      assert(tw.length == 1 && tw.head.contains(0.123457),
        s"HALF_UP tie must round to 0.123457, got ${tw.toSeq}")
    } finally q.stop()
  }
}

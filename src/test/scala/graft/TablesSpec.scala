package graft

import org.apache.spark.sql.functions._

/** Session/loader conventions that shape every query (round-12
  * session-layer review):
  *  - the nanos→micros normalization branch in Tables.events was DEAD
  *    against every local fixture (all three SFs store TIMESTAMP
  *    (MICROS)), so a regression there would first surface in a driver
  *    run — this spec synthesizes the nanos-generation shape and pins
  *    the division;
  *  - the batch surface's UTC guard (SparkEntry wraps every query fn)
  *    must reject a non-UTC caller session loudly — before it, a
  *    non-UTC session bucketed temporal operators in the host zone,
  *    silently for the rows-only-gated queries.
  */
class TablesSpec extends SparkSpec {

  test("Tables.events normalizes a nanos-long ts fixture to microsecond TimestampType") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_fixture").toString
    // the nanos generation reads as a plain long column under
    // nanosAsLong — synthesize exactly that physical shape
    val nanos = 1704153600123456789L // 2024-01-02 00:00:00.123456789 UTC
    Seq((1L, nanos), (2L, nanos + 999L)) // +999 ns: truncation, not rounding
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(s, dir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      ev.schema.treeString)
    val got = ev.orderBy("event_id")
      .select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).toSeq
    // DuckDB truncates nanos→micros; div 1000 on the long does the same
    assert(got == Seq(nanos / 1000, (nanos + 999) / 1000), got.toString)
  }

  test("a non-UTC caller session is rejected by every declared query (batch UTC guard)") {
    val s = spark
    val saved = s.conf.get("spark.sql.session.timeZone")
    try {
      s.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q05_join_multiway")(s, "/root/testdata/sf0.001")
      }
      assert(e.getMessage.contains("UTC-equivalent"), e.getMessage)
      // UTC-equivalent ids pass the same guard (the ADVICE r11 rule)
      for (tz <- Seq("Etc/UTC", "GMT", "+00:00", "UTC"))
        assert(GraftSession.isUtcEquivalent(tz), tz)
      assert(!GraftSession.isUtcEquivalent("Europe/Berlin"))
    } finally s.conf.set("spark.sql.session.timeZone", saved)
  }
}

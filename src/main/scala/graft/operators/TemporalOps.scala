package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal joins over `events` — operators Spark has no built-in for,
  * composed from existing ops (preference (a) of the extension ladder):
  *
  *  - As-of join (q41): for each left event, the latest right event at
  *    or before it. Implemented as the union-and-carry-forward pattern:
  *    tag both sides, sort by (key, ts, side), carry the last right
  *    payload forward with `last(ignoreNulls)` over an unbounded-
  *    preceding frame, keep left rows. ONE shuffle on the key — same
  *    cost as a plain window function; never a per-row probe.
  *  - Banded range join (q42): pairs within a time distance δ. Naive
  *    form is an inequality theta-join (O(n²) nested loop); banding
  *    buckets ts into δ-wide bins and equi-joins each bin to itself and
  *    its right neighbor — every qualifying pair shares a (bin, bin) or
  *    (bin, bin+1) bucket, so the join is hash-partitioned and the
  *    predicate only filters inside small buckets. At 100 TB the bin
  *    width tunes bucket size exactly like LSH band width.
  */
object TemporalOps {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q41_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val left = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        // dedup right rows per (user, ts) to the max-event_id row: ASOF
        // semantics are undefined among ts-tied rows in BOTH engines,
        // so pin one deterministic winner before joining (max(struct)
        // is lexicographic → max event_id carries ITS value along)
        val right = ev.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(struct(col("event_id"), col("value"))).as("r"))
          .select(
            col("user_id"), col("ts"),
            col("r.event_id").as("r_event_id"), col("r.value").as("r_value"))
        // side 0 sorts before side 1 at equal ts → "at or before" ties
        // resolve to the right row, matching ASOF JOIN's <= semantics
        val tagged = right
          .withColumn("side", lit(0)).withColumn("l_event_id", lit(null).cast("long"))
          .unionByName(
            left.withColumn("side", lit(1))
              .withColumn("r_event_id", lit(null).cast("long"))
              .withColumn("r_value", lit(null).cast("double"))
              .withColumnRenamed("event_id", "l_event_id")
              .select("user_id", "ts", "r_event_id", "r_value", "side", "l_event_id"))
        val w = Window.partitionBy("user_id").orderBy("ts", "side")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // ONE carried struct, not two independent last() calls — a
        // right row with NULL value must not let event_id and value
        // come from different rows
        val carry = when(
          col("side") === 0, struct(col("r_event_id"), col("r_value")))
        tagged
          .withColumn("asof", last(carry, ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(
            col("user_id"), col("l_event_id").as("event_id"), col("ts"),
            col("asof.r_event_id").as("asof_event_id"),
            col("asof.r_value").as("asof_value"))
      },
      Some(
        // row_number dedup (not arg_max: aggregate NULL-skipping could
        // pair max event_id with another row's value when value is NULL)
        "WITH r AS (SELECT user_id, ts, event_id, value FROM (" +
          "SELECT *, row_number() OVER (PARTITION BY user_id, ts " +
          "ORDER BY event_id DESC) AS rn FROM events " +
          "WHERE event_type = 'error') WHERE rn = 1) " +
          "SELECT l.user_id, l.event_id, l.ts, " +
          "r.event_id AS asof_event_id, r.value AS asof_value " +
          "FROM (SELECT * FROM events WHERE event_type = 'click') l " +
          "ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"),
    ),
    QuerySpec(
      "q42_range_join_banded",
      (s, dir) => {
        // click→error pairs of the same user within 30 minutes, banded:
        // equi-join on (user, 30-min bin) × {bin, bin+1} instead of an
        // O(n²) inequality nested loop
        val ev = Tables.events(s, dir)
        val click = ev.filter(col("event_type") === "click")
          .select(
            col("user_id"), col("event_id").as("click_id"),
            col("ts").as("c_ts"), (col("ts").cast("long") / 1800).cast("long").as("bin"))
        val err = ev.filter(col("event_type") === "error")
          .select(
            col("user_id"), col("event_id").as("error_id"),
            col("ts").as("e_ts"), (col("ts").cast("long") / 1800).cast("long").as("e_bin"))
        val expanded = click
          .withColumn("probe_bin", explode(array(col("bin"), col("bin") + 1)))
        expanded
          .join(err, expanded("user_id") === err("user_id") &&
            expanded("probe_bin") === err("e_bin"))
          .filter(
            col("e_ts") >= col("c_ts") &&
              col("e_ts").cast("long") - col("c_ts").cast("long") <= 1800)
          .select(expanded("user_id"), col("click_id"), col("error_id"),
            (col("e_ts").cast("long") - col("c_ts").cast("long")).as("dt_sec"))
      },
      Some(
        // oracle: the naive inequality join (DuckDB handles it fine at
        // oracle scale; the banded plan exists for the 100 TB path)
        "SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id, " +
          "date_diff('second', c.ts, e.ts) AS dt_sec " +
          "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
          "JOIN (SELECT * FROM events WHERE event_type = 'error') e " +
          "ON c.user_id = e.user_id AND e.ts >= c.ts " +
          "AND date_diff('second', c.ts, e.ts) <= 1800"),
    ),
    QuerySpec(
      // Temporal debounce: drop an event when the PREVIOUS event of the
      // same (user, type) is ≤ 6 h older — the "re-crawl of the same
      // page minutes later" suppression in snapshot curation (lag-based:
      // gap to the previous RAW event, the one-pass windowed form).
      // ONE shuffle on the compound key; the (ts, event_id) sort order
      // makes lag deterministic under equal timestamps. Drops ~10% of
      // the fixture at every sf, so the gate is non-degenerate.
      "q100_debounce",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn(
            "prev_us",
            lag(unix_micros(col("ts")), 1).over(
              Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))))
          .filter(
            col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 21600000000L)
          .select("event_id", "user_id", "event_type", "ts", "value"),
      Some(
        "SELECT event_id, user_id, event_type, ts, value FROM (" +
          "SELECT event_id, user_id, event_type, ts, value, " +
          "LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type " +
          "ORDER BY ts, event_id) AS prev_us FROM events) t " +
          "WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 21600000000"),
    ),
  )
}

package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Typed Dataset surface: the `groupByKey`/`mapGroups` escape hatch for
  * per-group imperative logic that SQL can't express. The gated query
  * here IS SQL-expressible on purpose — that's what makes it
  * oracle-checkable — but it runs through the typed path end to end
  * (case-class Encoder, AppendColumns, object-hash shuffle, MapGroups),
  * gating the API family the engine advertises for custom per-group
  * algorithms. Scale shape: ONE shuffle on the group key; per-group
  * state is the group's rows only (bounded by the largest group, never
  * the partition); for SQL-expressible stats a window/agg is the
  * cheaper plan — use this path only when the per-group logic is
  * genuinely imperative.
  */
object TypedOps {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      // Per-customer order-cadence stats via mapGroups: count and max
      // gap in days between consecutive orders.
      "q78_typed_mapgroups",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .select(
            col("o_custkey"),
            datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("dd"))
          .as[(Long, Int)]
          .groupByKey(_._1)
          .mapGroups { (custkey, rows) =>
            val days = rows.map(_._2).toArray
            java.util.Arrays.sort(days)
            var maxGap = 0L
            var i = 1
            while (i < days.length) {
              val g = (days(i) - days(i - 1)).toLong
              if (g > maxGap) maxGap = g
              i += 1
            }
            (custkey, days.length.toLong, maxGap)
          }
          .toDF("o_custkey", "n_orders", "max_gap_days")
      },
      Some(
        "WITH d AS (SELECT o_custkey, " +
          "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dd FROM orders), " +
          "g AS (SELECT o_custkey, dd - lag(dd) OVER (" +
          "PARTITION BY o_custkey ORDER BY dd) AS gap FROM d) " +
          "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
          "CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days " +
          "FROM g GROUP BY o_custkey"),
    ),
  )
}

package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-management join helpers for the 100 TB design point.
  *
  * AQE's skew-join splitting handles most skew at runtime; these exist
  * for the cases it can't: a broadcast-too-big dimension with a few
  * pathological hot keys (saltedJoin), and repeated fact-fact joins on
  * the same key where paying one bucketed write amortizes every future
  * shuffle away (co-located bucketed joins, see BucketingSpec for the
  * no-Exchange plan proof).
  */
object ScaleJoins {

  /** Equi-join `big ⋈ small` on `key` with the hot-key shuffle skew
    * broken by salting: every big-side row gets a deterministic salt in
    * [0, salts), the small side is replicated `salts`× — the shuffle
    * key becomes (key, salt), spreading a hot key over `salts`
    * partitions. Result is exactly the plain inner join.
    *
    * Salt derives from a hash of big-side columns (not rand()):
    * deterministic across retries/replays — a task retry at 100 TB must
    * not reshuffle rows to different salts. `saltCols` should name a
    * row-identity subset (a natural key); it must vary WITHIN a hot
    * join key or the salt can't spread it. Defaults to every column,
    * which is always correct but defeats column pruning — the scan
    * then reads the full schema just to compute the salt.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltCols: Seq[String] = Nil,
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltSrc = if (saltCols.nonEmpty) saltCols else big.columns.toSeq
    val saltCol: Column =
      pmod(xxhash64(saltSrc.map(col).toIndexedSeq: _*), lit(salts))
    val saltedBig = big.withColumn("__graft_salt", saltCol)
    val saltedSmall = small
      .withColumn("__graft_salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
    saltedBig
      .join(saltedSmall, Seq(key, "__graft_salt"))
      .drop("__graft_salt")
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      // the salted fact⋈dim join, oracle-gated: the result must be
      // EXACTLY the plain inner join (salting only re-keys the
      // shuffle); ScaleJoinsSpec separately proves the skew-spreading
      // plan shape on an adversarial 90%-hot-key input
      "q43_salted_join",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val supp = Tables(s, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
        // salt from the row's natural key so the lineitem scan prunes
        // to the 4 columns actually used (ReadSchema checked in
        // ScaleJoinsSpec) instead of hashing all 16
        saltedJoin(li, supp, "l_suppkey", 4,
            saltCols = Seq("l_orderkey", "l_linenumber"))
          .groupBy("s_name")
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"))
      },
      Some(
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items, " +
          "SUM(l_quantity) AS sum_qty " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY s_name"),
    ),
  )
}

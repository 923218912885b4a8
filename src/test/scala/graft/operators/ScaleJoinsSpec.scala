package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {

  test("saltedJoin equals the plain join on a 90%-skewed key and shuffles on (key, salt)") {
    val s = spark; import s.implicits._
    // 90% of big-side rows share key 0 — the classic hot key
    val big = (0 until 20000)
      .map(i => (if (i % 10 == 0) i % 50 else 0, i.toLong))
      .toDF("k", "payload")
    val small = (0 until 50).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = ScaleJoins.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)

    // the physical shuffle key must include the salt column
    val plan = ScaleJoins.saltedJoin(big, small, "k", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"), plan)

    // explicit saltCols: same result as the all-columns default
    val saltedSubset = ScaleJoins
      .saltedJoin(big, small, "k", 8, saltCols = Seq("payload"))
      .select("k", "payload", "name")
    assert(saltedSubset.except(plain).isEmpty && plain.except(saltedSubset).isEmpty)
  }

  test("q43 salts from the natural key so the lineitem scan prunes columns") {
    val s = spark
    val plan = graft.SparkEntry
      .queries("q43_salted_join")(s, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the scan must read only the join/salt/agg columns, not all 16 —
    // salting from the whole row would drag every column through the
    // scan just to compute the hash
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    for (c <- Seq("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"))
      assert(readSchema.contains(c), s"$c missing from $readSchema")
    for (c <- Seq("l_extendedprice", "l_shipdate", "l_returnflag"))
      assert(!readSchema.contains(c), s"$c should be pruned: $readSchema")
  }

  test("bucketed tables co-locate: join runs with no shuffle exchange") {
    val s = spark; import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse")
    val savedThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val facts = (0 until 5000).map(i => (i % 500, i * 1.0)).toDF("k", "v")
      val dims = (0 until 500).map(i => (i, s"d_$i")).toDF("k", "name")
      facts.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/facts").saveAsTable("graft_facts")
      dims.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/dims").saveAsTable("graft_dims")

      val joined = s.table("graft_facts").join(s.table("graft_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      // bucket-pruned co-located join: no Exchange node anywhere
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 5000)

      // contrast: the same join on unbucketed frames shuffles both sides
      val unbucketed = facts.join(dims, "k")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      s.sql("DROP TABLE IF EXISTS graft_facts")
      s.sql("DROP TABLE IF EXISTS graft_dims")
    }
  }

  test("q54's bucketed tables join with no Exchange on either input") {
    val s = spark
    val savedThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      // run q54 once to (re)write the bucketed tables into the catalog
      val q = graft.SparkEntry
        .queries("q54_bucketed_join")(s, "/root/testdata/sf0.001")
      assert(q.count() > 0)
      // the JOIN itself (before the c_mktsegment agg, which legitimately
      // shuffles) must be Exchange-free: both scans are bucket-aligned
      val joined = s.table("graft_bkt_orders")
        .join(s.table("graft_bkt_customer"),
          org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
    }
  }

  test("adaptive salting: measured top-key share derives the factor and engages on the hot key") {
    val s = spark; import s.implicits._
    // adversarial skew: 90% of rows on key 0 — the shape q120's report
    // would rank first
    val big = (0 until 20000)
      .map(i => (if (i % 10 == 0) i % 50 else 0, i.toLong))
      .toDF("k", "payload")
    val small = (0 until 50).map(k => (k, s"dim_$k")).toDF("k", "name")

    // the measurement is the skew report's statistic for this key
    val (top, total) = ScaleJoins.topKeyShare(big, "k")
    // key 0: the 18000 non-multiples of 10 plus the 400 rows with i%50==0
    assert(total == 20000 && top == 18400, s"top=$top total=$total")
    // share = 0.92 → ceil(0.92 × 16) = 15 of 16
    assert(ScaleJoins.derivedSalts(top, total, 16) == 15)
    // uniform data derives 1 — salting declines to engage
    assert(ScaleJoins.derivedSalts(top = 100, total = 20000, parallelism = 16) == 1)

    val salted = ScaleJoins.adaptiveSaltedJoin(big, small, "k", 16,
      saltCols = Seq("payload"))
    // engaged: the physical join key carries the salt column
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"),
      s"adaptive salting did not engage on the measured hot key: ${plan.take(600)}")
    // invisible in the result: exactly the plain join
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val got = salted.select("k", "payload", "name")
    assert(got.except(plain).isEmpty && plain.except(got).isEmpty)

    // below-threshold share: plain join, no salt machinery in the plan
    val uniform = (0 until 8000).map(i => (i % 50, i.toLong)).toDF("k", "payload")
    val notEngaged = ScaleJoins.adaptiveSaltedJoin(uniform, small, "k", 16)
    assert(!notEngaged.queryExecution.executedPlan.toString.contains("__graft_salt"))
  }

  test("plain AQE splits the q122 hot key natively once the join shuffles") {
    val s = spark; import s.implicits._
    // the q122 adversarial shape: 90% of big-side rows on one key, and
    // a join that must shuffle (broadcast disabled). AQE's skew-join
    // split is threshold-gated by partition BYTES, so scale the
    // thresholds to fixture size the way 256 MB defaults relate to a
    // real executor's partitions.
    val big = (0 until 200000)
      .map(i => (if (i % 10 == 0) i % 50 else 0, i.toLong))
      .toDF("k", "payload")
    val small = (0 until 50).map(k => (k, s"dim_$k")).toDF("k", "name")
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ).map(k => k -> s.conf.get(k))
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val joined = big.join(small, Seq("k"))
      // execute THIS tree so the AdaptiveSparkPlan finalizes
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-key join skewed: ${plan.take(800)}")
    } finally saved.foreach { case (k, v) => s.conf.set(k, v) }
  }

  test("AQE coalesces post-shuffle partitions at runtime") {
    val s = spark; import s.implicits._
    // 4 configured shuffle partitions but only a few KB of shuffle
    // data: AQE must coalesce the reducer side below the static config
    // instead of scheduling near-empty tasks — the runtime knob that
    // keeps a 100 TB plan's small stages from drowning in task
    // overhead.
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true", "AQE must be on")
    val agg = (0 until 1000).map(i => (i % 3, i.toLong)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    // execute THIS plan tree (count() would plan a separate one and
    // leave agg's AdaptiveSparkPlan un-finalized)
    assert(agg.collect().length == 3)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"), plan)
  }
}

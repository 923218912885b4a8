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
      val ds = Relational.datasetKey("/root/testdata/sf0.001")
      val joined = s.table(s"graft_bkt_orders_$ds")
        .join(s.table(s"graft_bkt_customer_$ds"),
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

  test("runtime bloom-filter join: the probe side is row-filtered before the shuffle") {
    // Row-level counterpart of q205's partition-level DPP: when a
    // selective dim filters a shuffled fact join, Spark injects a
    // bloom filter built from the dim's join keys into the fact scan
    // (bloom_filter_might_contain), so non-joining fact rows die at
    // the scan instead of riding the shuffle — at 100 TB that is the
    // difference between shuffling the table and shuffling the
    // matches. Production thresholds (10 MB build / 10 GB probe) are
    // scaled to fixture bytes, exactly like the AQE-skew test above;
    // the optimization must not change results.
    val s = spark
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
    ).map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      // the probe-side size gate is 10 GB in production — scaled to
      // fixture bytes so the injection decision logic runs here
      s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      // force a shuffled join: bloom injection targets shuffle joins
      // (a broadcast join already row-filters by construction)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dir = "/root/testdata/sf0.001"
      import org.apache.spark.sql.functions._
      val li = graft.Tables(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = graft.Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      // renders as might_contain(scalar-subquery [...]) over a
      // bloom_filter_agg of the dim's join keys
      assert(
        optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected on the probe side: $optimized")
      // result identity vs the un-filtered plan
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plainCnt = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(plainCnt > 0 && joined.count() == plainCnt)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("adaptive salting on an EMPTY frame fails with the named require, not an NPE (r16 review)") {
    // the empty aggregate reads (NULL, NULL); pre-fix, getLong NPE'd
    // before derivedSalts' designed "empty frame" require could fire
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "x")
    val small = Seq((1L, "a")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      ScaleJoins.adaptiveSaltedJoin(empty, small, "k", parallelism = 4)
    }
    assert(e.getMessage.contains("empty frame"),
      s"expected the named require, got: ${e.getMessage}")
  }
}

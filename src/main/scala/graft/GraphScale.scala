package graft

import org.apache.spark.sql.functions._

/** Graph-family scale audit (VERDICT r11 #2): the tradeEdges queries'
  * scale claims, measured as curves instead of argued in comments.
  *
  * Claims under audit (`operators/GraphOps.scala`):
  *  - q97/q109/q110 pair generation "fans out PER ORDER, so output is
  *    Σ_orders deg·(deg−1) with deg bounded by order size" — i.e. work
  *    grows LINEARLY in orders, never suppliers².
  *  - q91/q155 iteration bodies shuffle node-sized rank/label frames,
  *    so per-query shuffle volume grows with nodes+edges, not
  *    quadratically.
  *  - q208's peel joins the edge list against removed-so-far only.
  *
  * Corpus growth model (`dir@xN`): every order is replicated N×
  * deterministically (no RNG); replica k > 0 re-ids the ORDER
  * (o_orderkey·N + k) and maps the customer to a NEW customer id
  * (o_custkey + k·C, C = max custkey) while suppliers stay fixed —
  * the marketplace shape (buyers grow with the corpus, the supplier
  * catalog doesn't). Per-order fan-out is unchanged by construction,
  * so the fan-out-bounded claim predicts: pair-generation output and
  * shuffle volume grow ~N×, never supplier²; the customer-side node
  * frames grow ~N×; the distinct edge set grows ~N× (each new
  * customer brings its own (cust, supp) pairs).
  *
  * Per (scale, query) this main reports wall seconds, output rows,
  * and total shuffle read/write bytes (task-level metrics summed via
  * a listener — listener delivery is asynchronous, so counters are
  * read after a short settle; the per-run error is ≪ the 10×
  * between-scale signal being measured).
  *
  * Usage: runMain graft.GraphScale [dir[@xN][@pP] ...]
  *        (default: sf0.1 and sf0.1@x10)
  *
  * `@pP` sets `spark.sql.shuffle.partitions` to P for that pass only
  * (restored after) — the partition-sizing dial the r13 memory table
  * adjudicated in prose. AQE (on) only COALESCES partitions — it can
  * never split a too-big non-skewed partition above the initial
  * count — so the initial count is the deployment's lever and this
  * flag measures it instead of arguing it. The r15 run sharpened the
  * claim: the per-query MAX task peak does NOT return to the 1× band
  * at `@x10@p320` (it is pool-dynamics-bound — see the listener note
  * below), while the per-task MEDIAN (`task_exec_p50_mb`) is the
  * statistic that tracks bytes-per-partition and spill risk.
  */
object GraphScale {

  private val queries = Seq(
    "q91_pagerank", "q155_label_propagation", "q208_kcore",
    "q97_cooccur", "q109_backbone_triangles")

  /** Materialize the N× replicated corpus under /tmp; returns its dir.
    * Only the two tables the graph family reads are written.
    */
  private def synthesize(spark: org.apache.spark.sql.SparkSession, srcDir: String, xf: Int): String = {
    val out = s"/tmp/graft_graph_scale/${operators.Relational.datasetKey(srcDir)}_x$xf"
    val ord = Tables(spark, srcDir, "orders").select("o_orderkey", "o_custkey")
    val li = Tables(spark, srcDir, "lineitem").select("l_orderkey", "l_suppkey")
    val maxCust = ord.agg(max("o_custkey")).head().getLong(0)
    ord.crossJoin(spark.range(xf).toDF("k"))
      .select(
        (col("o_orderkey") * xf + col("k")).as("o_orderkey"),
        (col("o_custkey") + col("k") * maxCust).as("o_custkey"))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    li.crossJoin(spark.range(xf).toDF("k"))
      .select(
        (col("l_orderkey") * xf + col("k")).as("l_orderkey"),
        col("l_suppkey"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    out
  }

  def main(args: Array[String]): Unit = {
    val specs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/testdata/sf0.1@x10")
    // 100 ms executor memory polling (default = heartbeat-only, which a
    // short task never samples) so taskExecutorMetrics carries a real
    // JVM-heap peak. System property: must exist BEFORE the SparkConf
    // is built, and fromEnv owns the builder.
    System.setProperty("spark.executor.metrics.pollingInterval", "100ms")
    val spark = GraftSession.fromEnv()
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    // memory-pressure figure (VERDICT r12 stretch): peak per-task
    // execution memory (shuffle/agg data structures — the number that
    // predicts spill) is PER-QUERY attributable; peak JVM heap is a
    // JVM-GLOBAL gauge — in local mode one heap serves driver +
    // executor and uncollected garbage from query A inflates query B's
    // polled reading, so heap is reported once PER SCALE, never
    // per query (the instrument could not read low after a heavy
    // query — the falsifiability failure class).
    val peakHeap = new java.util.concurrent.atomic.AtomicLong
    val peakTaskExec = new java.util.concurrent.atomic.AtomicLong
    // per-task peaks, kept individually: the MAX over tasks is pool-
    // dynamics-bound in a shared local JVM (a task may greedily grab
    // up to pool/activeTasks, so smaller faster tasks → fewer active
    // near stage tails → BIGGER single-task grabs — the r15 @p320 run
    // read a HIGHER max at 10× the partitions), so the statistic that
    // actually tracks bytes-per-partition (the spill-risk claim) is a
    // per-task QUANTILE over the tasks that used execution memory.
    val taskExecPeaks = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        Option(te.taskMetrics).foreach { m =>
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead): Unit
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
          peakTaskExec.accumulateAndGet(m.peakExecutionMemory, math.max): Unit
          if (m.peakExecutionMemory > 0)
            taskExecPeaks.add(m.peakExecutionMemory): Unit
        }
        Option(te.taskExecutorMetrics).foreach { em =>
          peakHeap.accumulateAndGet(em.getMetricValue("JVMHeapMemory"), math.max): Unit
        }
      }
    })
    // one scale pass: corpus dir + shuffle-partition setting are set
    // up by the spec loop below
    // corpus stats memoized per dir: a multi-@p sweep must not re-run
    // the heavy distinct-edge join per partition setting (and the
    // counts are properties of the CORPUS, not of the pass)
    val statsCache = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def runScale(dir: String, label: String): Unit = {
      val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
      val (nOrders, nEdges) = statsCache.getOrElseUpdate(dir, {
        val no = Tables(spark, dir, "orders").count()
        // the structural quantity every claim is phrased against
        val ne = Tables(spark, dir, "lineitem")
          .join(Tables(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select("o_custkey", "l_suppkey").distinct().count()
        (no, ne)
      })
      peakHeap.set(0) // per-SCALE window (see the JVM-global note above)
      queries.foreach { q =>
        val fn = SparkEntry.queries(q)
        // warm rep: classloading/codegen/scan cache out of the reading
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        Thread.sleep(1000)
        shufRead.set(0); shufWrite.set(0)
        peakTaskExec.set(0)
        taskExecPeaks.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener settle
        // snapshot BEFORE the untimed row-count action re-executes
        // the plan and pollutes the counters
        val (sr, sw) = (shufRead.get, shufWrite.get)
        val pe = peakTaskExec.get
        val peaks = {
          import scala.jdk.CollectionConverters._
          taskExecPeaks.iterator().asScala.map(_.longValue).toArray.sorted
        }
        val p50 = if (peaks.isEmpty) 0L else peaks(peaks.length / 2)
        val rows = df.count()
        def mb(b: Long): Double = math.rint(b / 1048.576) / 1000
        println(
          s"""{"metric":"graph_scale","sf":"$label","query":"$q","n_orders":$nOrders,""" +
            s""""n_edges":$nEdges,"shuffle_partitions":$shufflePartitions,""" +
            s""""wall_s":${math.rint(wall * 1000) / 1000},"rows":$rows,""" +
            s""""shuffle_read_mb":${mb(sr)},"shuffle_write_mb":${mb(sw)},""" +
            s""""peak_task_exec_mb":${mb(pe)},"task_exec_p50_mb":${mb(p50)},""" +
            s""""n_mem_tasks":${peaks.length}}""")
      }
      // JVM-global heap peak across this scale's whole query family
      val heapMb = math.rint(peakHeap.get / 1048.576) / 1000
      println(
        s"""{"metric":"graph_scale_mem","sf":"$label","peak_heap_mb":$heapMb}""")
    }

    // synthesized corpora memoized per (src, xf) WITHIN the run: a
    // multi-@p sweep of one scale must not rewrite the replicated
    // parquet (or recompute the heavy edge-count join in runScale) per
    // partition setting. In-run memoization only — a pre-existing /tmp
    // dir from a CRASHED earlier run could be partial, so a fresh run
    // always synthesizes fresh (review finding, r15).
    val synthCache = scala.collection.mutable.Map.empty[(String, Int), String]

    try {
      specs.foreach { spec =>
        // dir[@xN][@pP] — N: corpus replication, P: shuffle partitions.
        // Strict parse (review finding, r15): duplicate or malformed
        // tokens must fail loudly, not silently run a DIFFERENT
        // experiment than requested and mislabel its curve.
        val parts = spec.split("@")
        val src = parts.head
        def dim(prefix: String): Option[Int] = {
          val ts = parts.tail.filter(_.startsWith(prefix))
          require(ts.length <= 1,
            s"bad spec '$spec': duplicate @$prefix tokens (${ts.mkString(", ")})")
          ts.headOption.map { t =>
            t.drop(1).toIntOption.filter(_ > 0).getOrElse(
              sys.error(s"bad spec '$spec': @$t is not a positive integer"))
          }
        }
        require(parts.tail.forall(t => t.startsWith("x") || t.startsWith("p")),
          s"bad spec '$spec': expected dir[@xN][@pP]")
        val xf = dim("x")
        val np = dim("p")
        val (dir, baseLabel) = xf match {
          case Some(n) =>
            (synthCache.getOrElseUpdate((src, n), synthesize(spark, src, n)),
              s"${new java.io.File(src).getName}_x$n")
          case None => (src, new java.io.File(src).getName)
        }
        val label = np.map(p => s"${baseLabel}_p$p").getOrElse(baseLabel)
        val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
        np.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p.toString))
        try runScale(dir, label)
        finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
    } finally spark.stop()
  }
}

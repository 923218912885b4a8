package graft

/** Per-query bench/explain tool: `runMain graft.BenchOne q29_simhash_pairs ...`
  * Same session config as Bench (via GraftSession); set
  * SPARK_GRAFT_EXPLAIN=1 to dump plans, SPARK_GRAFT_STAGES=1 for
  * per-stage wall times. Timing drives the noop sink like Bench (a
  * count() would let Catalyst prune projection-only work); the row
  * count shown is a separate untimed action.
  */
object BenchOne {
  // which (query, phase) the stage listener attributes events to —
  // without the tag, stage lines from one query's untimed count()
  // re-execution interleave indistinguishably with the next query's
  // timed section (r13 instrument review). Delivery is async, so the
  // label is best-effort under lag; the per-query sleep below drains
  // the bus between phases.
  @volatile private var stagePhase = "init"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    val stages = sys.env.contains("SPARK_GRAFT_STAGES")
    if (stages)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {
            t0 <- si.submissionTime; t1 <- si.completionTime
          } yield t1 - t0
          println(s"[stage ${si.stageId}][$stagePhase] " +
            s"${si.name.takeWhile(_ != '\n').take(80)} " +
            s"tasks=${si.numTasks} wall=${ms.getOrElse(-1L)}ms")
        }
      })
    // settle the async listener bus so a phase's stage lines land under
    // its own tag before the phase label moves on (the bus API is
    // private[spark]; a short sleep is the accessible equivalent)
    def drain(): Unit = if (stages) Thread.sleep(500)
    // host-load calibration around the measured queries, so one-off
    // re-measures recorded in BASELINE.md carry the same effective-cores
    // context as full Bench runs (a repeated query name is the warm-rep
    // protocol: pass it N times, read reps 2+)
    val nominal = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val calPre = Bench.effectiveCores(nominal)
    println(f"== cal pre: effective_cores=${calPre._1}%.1f")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      if (explain) {
        // EXPLAIN mode is for READING plans, not recording times: the
        // construction (incl. any eager scratch writes) and the plan
        // dump run untimed, and only the noop execution is timed — so
        // the dump's cost never pollutes a reading, at the price of
        // construction-time exclusion. Comparable times come from the
        // non-EXPLAIN path, which times construction + execution
        // exactly like Bench.
        stagePhase = s"$q:construct"
        val df = fn(spark, sfDir)
        df.explain("formatted")
        drain(); stagePhase = s"$q:timed"
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime - t0) / 1e9
        drain(); stagePhase = s"$q:untimed-count"
        println(s"== $q: rows=${df.count()} time=${secs}s (explain mode: construction untimed)")
        drain()
      } else {
        stagePhase = s"$q:timed"
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime - t0) / 1e9
        drain(); stagePhase = s"$q:untimed-count"
        println(s"== $q: rows=${df.count()} time=${secs}s")
        drain()
      }
    }
    val calPost = Bench.effectiveCores(nominal)
    println(f"== cal post: effective_cores=${calPost._1}%.1f")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

// top-level case classes: MemoryStream encoders need stable toplevel
// types (same note as the streaming specs)
final case class SbSigEv(doc_id: Long, simhash: Long, ts: Timestamp)
final case class SbDocEv(doc_id: Long, text: String, ts: Timestamp)

/** Streaming throughput measure (VERDICT r11 #6): every streaming
  * claim so far is correctness/state-bound; this main records rows/sec
  * and per-batch latency for the two corpus-keyed twins — nearDup
  * banding and incremental dedup — plus the state-store timing
  * breakdown needed to adjudicate whether state lookups or batch
  * execution (shuffles) dominate.
  *
  * Protocol: MemoryStream-driven like the equivalence specs, but sized
  * for throughput — the sf0.1 corpus replicated `xf`× under fresh ids
  * with 1 s event spacing, fed in fixed-size chunks, `noop` sink (a
  * memory sink would accumulate every emitted pair). The first chunk
  * is an untimed warm batch (stream start + first state-store load);
  * the timed window covers all remaining chunks.
  *
  * Reported per twin (one JSON line): input rows, wall, rows/sec,
  * batches, mean addBatch ms (wall per micro-batch), summed
  * state-operator update/removal/commit ms, max state rows and bytes.
  * `state_share` = state-op ms / summed task executorRunTime ms —
  * BOTH cumulative across parallel tasks (state times are summed over
  * the 32 state-store partitions, so dividing by per-batch wall would
  * overstate them ~32×). ≪ 0.5 means batch execution (joins/
  * shuffles/codegen), not state lookups, dominates.
  *
  * Usage: runMain graft.StreamBench [sfDir] [xf]
  *        (defaults: /root/testdata/sf0.1, 10)
  */
object StreamBench {

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000

  private def report(
      twin: String, rows: Long, wall: Double, taskMs: Long,
      progresses: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]): Unit = {
    val timed = progresses.filter(_.numInputRows > 0)
    val addBatch = timed.flatMap(p => Option(p.durationMs.get("addBatch")).map(_.toLong))
    val stateOps = timed.flatMap(_.stateOperators.toSeq)
    val stateMs = stateOps.map(o =>
      o.allUpdatesTimeMs + o.allRemovalsTimeMs + o.commitTimeMs).sum
    println(
      s"""{"metric":"stream_bench","twin":"$twin","rows":$rows,"wall_s":${r3(wall)},""" +
        s""""rows_per_sec":${math.rint(rows / wall)},"n_batches":${timed.size},""" +
        s""""mean_batch_ms":${if (addBatch.isEmpty) 0 else addBatch.sum / addBatch.size},""" +
        s""""state_ms":$stateMs,"task_ms":$taskMs,""" +
        s""""state_share":${r3(stateMs.toDouble / taskMs.max(1L))},""" +
        s""""state_rows_max":${if (stateOps.isEmpty) 0 else stateOps.map(_.numRowsTotal).max},""" +
        s""""state_bytes_max":${if (stateOps.isEmpty) 0 else stateOps.map(_.memoryUsedBytes).max}}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val xf = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.fromEnv()
    // recentProgress is a BOUNDED rolling buffer (default 100): at
    // large xf the drop(before) accounting below would silently slice
    // an arbitrary suffix of batches. Size it past any plausible run.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // cumulative task executor time — the denominator state_share needs
    // (same cumulative-across-parallel-tasks basis as the state times)
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime): Unit)
    })
    try {
      // ---- twin 1: nearDupPairsStream (banded simhash matcher) ----
      // input = the q28 stateless signature stage's output, replicated
      // xf× under fresh ids; 1 s spacing with a 1 h watermark bounds
      // live state to ~3600 documents — the steady-state service regime
      val sigs = SparkEntry.queries("q28_simhash")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val sigEvents = (0 until xf).flatMap { k =>
        sigs.map { case (id, sh) => (id + k * 10000000L, sh) }
      }.zipWithIndex.map { case ((id, sh), i) =>
        SbSigEv(id, sh, new Timestamp(base + i * 1000L))
      }
      val in1 = MemoryStream[SbSigEv]
      val q1 = graft.streaming.Streams
        .nearDupPairsStream(in1.toDF(), watermarkMs = 3600000L)
        .writeStream.format("noop").outputMode("append").start()
      try {
        val chunks = sigEvents.grouped(2000).toSeq
        in1.addData(chunks.head: _*); q1.processAllAvailable() // warm
        val before = q1.recentProgress.length
        Thread.sleep(500); taskMs.set(0)
        val t0 = System.nanoTime()
        chunks.tail.foreach { c => in1.addData(c: _*); q1.processAllAvailable() }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener settle
        report("neardup_pairs", sigEvents.length - chunks.head.length, wall,
          taskMs.get, q1.recentProgress.drop(before).toSeq)
      } finally q1.stop()

      // ---- twin 2: incrementalDedupStream (corpus-probe decisions) ----
      // q128's split: corpus = doc_id % 10 != 0 (static signature
      // tables), stream = the % 10 == 0 shard replicated xf×
      val d = Tables(spark, sfDir, "documents")
      val corpusFp = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        .select(md5(col("text")).as("cfp")).localCheckpoint()
      val corpusBands = operators.DedupOps.minhashBands(spark, sfDir)
        .filter(pmod(col("doc_id"), lit(10)) =!= 0)
        .select(col("band").cast("bigint").as("cband"), col("sig").as("csig"))
        .localCheckpoint()
      val stop = operators.DedupOps.stopShingleRow(spark, sfDir)
        .collect()(0).getSeq[String](0)
      val shard = d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val docEvents = (0 until xf).flatMap { k =>
        shard.map { case (id, t) => (id + k * 10000000L, t) }
      }.zipWithIndex.map { case ((id, t), i) =>
        SbDocEv(id, t, new Timestamp(base + i * 1000L))
      }
      val in2 = MemoryStream[SbDocEv]
      val q2 = graft.streaming.Streams
        .incrementalDedupStream(in2.toDF(), corpusFp, corpusBands, stop, "1 hour")
        .writeStream.format("noop").outputMode("append").start()
      try {
        val chunks = docEvents.grouped(500).toSeq
        in2.addData(chunks.head: _*); q2.processAllAvailable() // warm
        val before = q2.recentProgress.length
        Thread.sleep(500); taskMs.set(0)
        val t0 = System.nanoTime()
        chunks.tail.foreach { c => in2.addData(c: _*); q2.processAllAvailable() }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener settle
        report("incremental_dedup", docEvents.length - chunks.head.length, wall,
          taskMs.get, q2.recentProgress.drop(before).toSeq)
      } finally q2.stop()
    } finally spark.stop()
  }
}

package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

// top-level for encoder codegen (see StreamsSpec note)
case class DocEv(doc_id: Long, text: String, ts: Timestamp)

/** Streaming incremental dedup (VERDICT r8 #4): incrementalDedupStream
  * must reproduce batch q128's per-document decisions on a replayed
  * shard, and survive a stop/restart from checkpoint without
  * duplicating or dropping decisions.
  */
class StreamingIncrementalDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The q128 fixture split: batch = doc_id % 10 == 0, corpus = rest.
    * Also returns one corpus document's exact text — streamed under a
    * fresh id to exercise the exact-dup probe, which the sf0.001
    * fixture's own split never trips (no cross-split identical texts).
    */
  private def fixture(s: org.apache.spark.sql.SparkSession) = {
    val d = graft.Tables(s, sfDir, "documents")
    val shard = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val corpusText = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .orderBy(col("doc_id")).select("text").head().getString(0)
    val corpusFp = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(md5(col("text")).as("cfp"))
    val corpusBands = DedupOps.minhashBands(s, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("band").cast("bigint").as("cband"), col("sig").as("csig"))
    val stop = DedupOps.stopShingleRow(s, sfDir)
      .collect()(0).getSeq[String](0)
    (shard, corpusText, corpusFp, corpusBands, stop)
  }

  /** An id outside the fixture range, streamed with corpus text. */
  private val copyId = 900000L

  private def batchTruth(s: org.apache.spark.sql.SparkSession) = {
    val t = graft.SparkEntry.queries("q128_incremental_dedup")(s, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(t.nonEmpty, "batch q128 returned no rows — vacuous equivalence")
    assert(t.exists(_._3 == 1L) && t.exists(_._4 == 1L),
      s"fixture must exercise near-dup AND novel outcomes: $t")
    t
  }

  test("replayed shard reproduces batch q128 decisions exactly") {
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val (shard, corpusText, corpusFp, corpusBands, stop) = fixture(s)
    val want = batchTruth(s)

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = shard.map { case (id, txt) => DocEv(id, txt, new Timestamp(base + id * 1000)) } :+
      // byte-identical corpus copy: must flag exact_dup (and near_dup)
      DocEv(copyId, corpusText, new Timestamp(base + 999000L))

    val input = MemoryStream[DocEv]
    val q = Streams
      .incrementalDedupStream(input.toDF(), corpusFp, corpusBands, stop, "1 minute")
      .writeStream.format("memory").queryName("incdedup_eq")
      .outputMode("append").start()
    try {
      // several micro-batches: decisions must not depend on batching
      events.grouped(events.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // two flush rows: the first advances the watermark past every
      // real event, the second triggers the batch that emits them
      input.addData(DocEv(-1L, "flush marker one", new Timestamp(base + 86400000L)))
      q.processAllAvailable()
      input.addData(DocEv(-2L, "flush marker two", new Timestamp(base + 86400000L * 2)))
      q.processAllAvailable()
      val all = s.table("incdedup_eq")
        .filter(col("doc_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val got = all.filter(_._1 != copyId)
      assert(got == want,
        s"stream≠batch: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      val copyRow = all.find(_._1 == copyId)
      assert(copyRow.exists(r => r._2 == 1L && r._4 == 0L),
        s"byte-identical corpus copy must flag exact_dup and not novel: $copyRow")
    } finally q.stop()
  }

  test("static probe tables are materialized once, not re-aggregated per micro-batch") {
    // VERDICT r12 #1: the per-batch cost was dominated by re-running
    // the two corpus-sized distinct() shuffles inside the stream-static
    // probes. After materialization the per-batch plan must read both
    // static sides from checkpointed RDD scans, with NO aggregation
    // keyed on the static columns anywhere in the plan.
    val s = spark; import s.implicits._
    implicit val sc = s.sqlContext
    val (shard, _, corpusFp, corpusBands, stop) = fixture(s)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val input = MemoryStream[DocEv]
    val q = Streams
      .incrementalDedupStream(input.toDF(), corpusFp, corpusBands, stop, "1 minute")
      .writeStream.format("noop").outputMode("append").start()
    try {
      input.addData(shard.take(5).map { case (id, txt) =>
        DocEv(id, txt, new Timestamp(base + id * 1000))
      }.toIndexedSeq: _*)
      q.processAllAvailable()
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos)) { q.explain(extended = false) }
      val plan = bos.toString
      assert(plan.contains("ExistingRDD"),
        s"static sides not checkpointed — no ExistingRDD scan in:\n$plan")
      val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
      val offenders = aggLines.filter(l => l.contains("cband") || l.contains("cfp"))
      assert(offenders.isEmpty,
        s"per-batch plan re-aggregates a static probe table:\n${offenders.mkString("\n")}")
    } finally q.stop()
  }

  test("checkpointed restart is exactly-once: no duplicate or lost decisions") {
    val s = spark; import s.implicits._
    val (shard, _, corpusFp, corpusBands, stop) = fixture(s)
    val want = batchTruth(s)

    val root = java.nio.file.Files.createTempDirectory("graft_incdedup")
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    def startQuery() =
      Streams
        .incrementalDedupStream(
          s.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(in),
          corpusFp, corpusBands, stop, "1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val (halfA, halfB) = shard.splitAt(shard.length / 2)
    def writeBatch(docs: Array[(Long, String)], tsOffsetMs: Long): Unit =
      docs.map { case (id, txt) => DocEv(id, txt, new Timestamp(base + tsOffsetMs)) }
        .toSeq.toDF()
        .coalesce(1).write.mode("append").parquet(in)

    try {
      // shard half A lands → process → stop (simulated redeploy)
      writeBatch(halfA, 0L)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()

      // half B lands an hour later, while the query is down; its batch
      // advances the watermark past A, finalizing A's decisions
      writeBatch(halfB, 3600000L)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      // a flush row finalizes B after a second restart
      writeBatch(Array((-1L, "flush marker")), 7200000L)
      val q3 = startQuery()
      try q3.processAllAvailable() finally q3.stop()

      val rows = s.read.parquet(out).filter(col("doc_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.length == rows.toSet.size,
        s"restart duplicated decisions: ${rows.length} rows, ${rows.toSet.size} distinct")
      assert(rows.toSet == want,
        s"restart≠batch: missing=${(want -- rows.toSet).take(5)} extra=${(rows.toSet -- want).take(5)}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }
}

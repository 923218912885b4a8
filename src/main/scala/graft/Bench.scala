package graft

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  *
  * Queries run in declared specs order (a Map would randomize order
  * between runs, attributing JVM/codegen warmup to arbitrary queries).
  * An untimed warmup pass at sf0.001 first-touches every query's code
  * path — classloading, Catalyst, codegen — so the timed pass measures
  * steady-state execution, which is what a long-running cluster sees.
  *
  * Queries are driven through the `noop` sink, not count(): under a
  * count() Catalyst prunes every deterministic projection expression,
  * so projection-only queries (md5 fingerprints, tokenizers, scalar
  * batteries) would be timed as empty-schema row-count scans. The noop
  * write materializes every output column and discards it.
  *
  * Per-query time = min of two timed passes: single-shot timings on a
  * shared box carry ±10% GC/scheduler noise that dwarfs real plan
  * deltas; min-of-N is the standard steady-state estimator (the
  * workload per pass is identical and fully re-executed — nothing is
  * cached between passes beyond what a warm cluster would hold).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.fromEnv()
    val specs = SparkEntry.specs
    def run(q: QuerySpec, dir: String): Unit =
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
    specs.foreach { q =>
      try run(q, warmDir)
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timedPass(): Seq[(String, Double)] = specs.map { q =>
      val t0 = System.nanoTime()
      try run(q, sfDir)
      catch {
        case e: Throwable =>
          errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val (pass1, pass2) = (timedPass(), timedPass().toMap)
    val results = pass1.map { case (name, t) => name -> math.min(t, pass2(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) =>
        s""""${GraftSession.jsonEscape(k)}":"${GraftSession.jsonEscape(v)}""""
      }.mkString(""","errors":{""", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$errJson}""")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Per-query bench/explain tool: `runMain graft.BenchOne q29_simhash_pairs ...`
  * Same session config as Bench; set SPARK_GRAFT_EXPLAIN=1 to dump plans.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {
            t0 <- si.submissionTime; t1 <- si.completionTime
          } yield t1 - t0
          println(s"[stage ${si.stageId}] ${si.name.takeWhile(_ != '\n').take(80)} " +
            s"tasks=${si.numTasks} wall=${ms.getOrElse(-1L)}ms")
        }
      })
    for (q <- args) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
      val n = df.count()
      println(s"== $q: rows=$n time=${(System.nanoTime - t0) / 1e9}s")
    }
    spark.stop()
  }
}

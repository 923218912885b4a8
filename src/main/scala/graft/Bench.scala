package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  *
  * Queries run in declared specs order (a Map would randomize order
  * between runs, attributing JVM/codegen warmup to arbitrary queries).
  * An untimed warmup pass at sf0.001 first-touches every query's code
  * path — classloading, Catalyst, codegen — so the timed pass measures
  * steady-state execution, which is what a long-running cluster sees.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val specs = SparkEntry.specs
    specs.foreach { q =>
      try q.fn(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = specs.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
        .mkString(""","errors":{""", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$errJson}""")
    spark.stop()
  }
}

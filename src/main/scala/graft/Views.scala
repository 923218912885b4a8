package graft

import org.apache.spark.sql.SparkSession

/** SQL entry point: register every fixture table as a temp view (plus
  * the custom functions) so `spark.sql("...")` works over the engine's
  * data — the SQL surface SURVEY §2 declares on top of Catalyst.
  */
object Views {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    functions.GraftFunctions.ensureRegistered(spark)
    functions.PearsonAgg.register(spark)
    functions.SimhashAggs.register(spark)
    tables.foreach { t =>
      val path = s"$dir/$t.parquet"
      if (new java.io.File(path).exists()) {
        val df = if (t == "events") Tables.events(spark, dir) else Tables(spark, dir, t)
        df.createOrReplaceTempView(t)
      }
    }
  }
}

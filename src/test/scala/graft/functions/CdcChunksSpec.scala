package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native cdc_chunks kernel vs the higher-order SQL formulation of
  * the same cut rule — the two must agree chunk-for-chunk (the kernel
  * exists purely for codegen speed, not different semantics).
  */
class CdcChunksSpec extends SparkSpec {

  test("native cdc_chunks equals the interpreted lambda formulation on the fixture") {
    GraftFunctions.ensureRegistered(spark)
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val native = d.select(col("doc_id"), expr("cdc_chunks(text)").as("chunks"))
    val lambda = d
      .withColumn("cc", expr("transform(split(text, ''), ch -> ascii(ch))"))
      .withColumn("cuts", expr(
        "concat(array(0), filter(sequence(4, greatest(length(text) - 1, 4)), " +
          "i -> i <= length(text) - 1 AND " +
          "(cc[i - 4] * 2248091 + cc[i - 3] * 17161 + cc[i - 2] * 131 + cc[i - 1]) " +
          "% 16 = 0), array(length(text)))"))
      .select(col("doc_id"), expr(
        "transform(sequence(1, size(cuts) - 1), " +
          "k -> substr(text, cuts[k - 1] + 1, cuts[k] - cuts[k - 1]))").as("chunks"))
    assert(native.count() > 0)
    assert(native.exceptAll(lambda).isEmpty && lambda.exceptAll(native).isEmpty)
  }

  test("degenerate inputs: empty, shorter-than-gram, and null") {
    GraftFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      "SELECT cdc_chunks('') AS a, cdc_chunks('abc') AS b, " +
        "cdc_chunks(CAST(NULL AS STRING)) AS c").collect()(0)
    assert(rows.getSeq[String](0) == Seq(""))
    assert(rows.getSeq[String](1) == Seq("abc"))
    assert(rows.isNullAt(2))
  }

  test("chunks reconstruct the original text exactly") {
    GraftFunctions.ensureRegistered(spark)
    val bad = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"), expr("concat_ws('', cdc_chunks(text))").as("rt"))
      .filter(col("text") =!= col("rt")).count()
    assert(bad == 0L)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic gates for the curation operators (q44–q50) beyond the
  * DuckDB hash oracle: determinism of the hash splits, redaction
  * completeness, metric ranges, bloom-prune exactness, and packing
  * invariants.
  */
class CurationOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame =
    CurationOps.specs.find(_.name == name).get.fn(spark, sfDir)

  test("q44 split is deterministic and roughly 80/10/10") {
    val a = run("q44_split_hash").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = run("q44_split_hash").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "hash split must be identical across runs")
    val n = a.values.sum.toDouble
    // 500 docs: binomial(500, 0.8) is within ±0.10 of the mean w.h.p.
    assert(math.abs(a("train") / n - 0.8) < 0.10, s"train frac off: $a")
    assert(a.keySet == Set("train", "val", "test"))
  }

  test("q45 keeps a monotone fraction per source and never invents rows") {
    val kept = run("q45_source_mixture")
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(kept.count() < total)
    // every kept row satisfies its own keep predicate
    assert(kept.filter(col("bucket") >= col("keep_pct")).count() == 0)
  }

  test("q45 dies LOUDLY on an unparseable source id (r16 review)") {
    // A malformed source name must kill the job with the declared
    // message, not ride a NULL keep_pct into `bucket < NULL` = unknown
    // and silently drop the source from the mixture — the
    // silent-data-loss class of the r15 pipeline review. Red under the
    // pre-fix shape: non-ANSI CAST nulls (rows vanish, no error);
    // ANSI throws, but a generic cast error without the query's name
    // or the offending value.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q45_loud")
    try {
      Seq(
        (1L, "alpha beta gamma", "en", "src3", 16L),
        (2L, "delta epsilon zeta", "en", "weird-source", 18L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val e = intercept[Exception] {
        CurationOps.specs.find(_.name == "q45_source_mixture").get
          .fn(spark, dir.toString).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("unparseable source id: weird-source")),
        s"failure is not the declared guard: ${messages(e).mkString(" | ").take(300)}")
    } finally graft.GraftSession.rmTree(dir.toFile)
  }

  test("q45 drops a NULL source silently — only non-NULL garbage is malformed (r16 ADVICE)") {
    // The loud contract splits on NULL: DuckDB's oracle CAST(NULL) is
    // silently NULL (row drops via `bucket < NULL`), and an absent
    // dimension is unknown, not malformed — so the Spark side must
    // ALSO drop it rather than kill the job, or the engines disagree
    // on any corpus with a NULL source. Red under the r16 shape: the
    // raise_error branch fired on NULL ('<null>') and this collect
    // died. The src19 row (keep_pct 100, bucket always < 100) proves
    // rows still flow.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q45_null")
    try {
      Seq(
        (1L, "alpha beta gamma", "en", Some("src19"), 16L),
        (2L, "delta epsilon zeta", "en", None, 18L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = CurationOps.specs.find(_.name == "q45_source_mixture").get
        .fn(spark, dir.toString).collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(1L),
        s"NULL-source row must drop, src19 row must survive: ${out.toSeq}")
    } finally graft.GraftSession.rmTree(dir.toFile)
  }

  test("q46 redacted text contains no residual PII matches") {
    val out = run("q46_pii_redact")
    val residual = out.filter(
      col("redacted").rlike("[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}") ||
        col("redacted").rlike("\\b[0-9]{3}-[0-9]{4}\\b") ||
        col("redacted").rlike("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"))
    assert(residual.count() == 0, "redaction left a matchable PII span")
    // the augmentation guarantees at least one of each per doc
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1 || col("n_ips") < 1).count() == 0)
  }

  test("q47 repetition fractions are in [0,1] and a hand-built doc checks out") {
    val out = run("q47_repetition")
    assert(out.filter(
      col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1 ||
        col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1 ||
        col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).count() == 0)
    // "a b a b a": bigrams [a b, b a, a b, b a] → 4 grams, 2 distinct,
    // dup frac 0.5, top share 0.5; trigrams [a b a, b a b, a b a] →
    // 3 grams, 2 distinct, dup frac 1/3. Run the REAL operator over a
    // one-doc table by pointing it at a scratch parquet dir.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_curation_probe").toString
    try {
      Seq((1L, "src0", "a b a b a")).toDF("doc_id", "source", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val row = CurationOps.specs.find(_.name == "q47_repetition").get
        .fn(spark, tmp).head()
      assert(row.getAs[Long]("n_bigrams") == 4L)
      assert(math.abs(row.getAs[Double]("dup_bigram_frac") - 0.5) < 1e-12)
      assert(math.abs(row.getAs[Double]("top_bigram_frac") - 0.5) < 1e-12)
      assert(math.abs(row.getAs[Double]("dup_trigram_frac") - 1.0 / 3.0) < 1e-12)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("q48 bloom prune equals the exact anti-join (no false drops)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("fp", md5(col("text")))
    val exact = d.join(
      d.filter(pmod(col("doc_id"), lit(7)) === 0).select(col("fp").as("bfp")),
      col("fp") === col("bfp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = run("q48_bloom_blocklist").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == exact, "bloom-pruned result must equal exact NOT IN blocklist")
  }

  test("q49 per-source cumulative offsets are consistent and bounded") {
    val out = run("q49_sequence_pack")
    assert(out.filter(col("seq_offset") < 0 || col("seq_offset") >= 512).count() == 0)
    // first doc of every source starts at seq 0 offset 0
    val firsts = out.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("seq_id") =!= 0 || col("seq_offset") =!= 0).count() == 0)
    // seq_id is non-decreasing in doc_id within a source
    val viol = out.withColumn("prev",
      lag("seq_id", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")))
      .filter(col("prev").isNotNull && col("seq_id") < col("prev"))
    assert(viol.count() == 0)
  }

  test("q50 normalization is idempotent and lowercase-alnum only") {
    val out = run("q50_normalize_text")
    val renorm = out.withColumn("again",
      trim(regexp_replace(
        regexp_replace(lower(col("text_norm")), lit("[^a-z0-9 ]"), lit(" ")),
        lit("  +"), lit(" "))))
    assert(renorm.filter(col("again") =!= col("text_norm")).count() == 0, "not idempotent")
    assert(out.filter(col("text_norm").rlike("[^a-z0-9 ]")).count() == 0)
    assert(out.filter(col("len_norm") > col("len_raw")).count() == 0)
  }
}

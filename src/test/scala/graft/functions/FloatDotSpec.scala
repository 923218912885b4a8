package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FloatDotSpec extends SparkSpec {

  test("float_dot matches the aggregate/zip_with composition bit-for-bit") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      col("id"),
      expr("float_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "0D, (acc, v) -> acc + v)").as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
    // and against a plain Scala fold
    val got = both.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { case (i, a, b) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      assert(got(i) == expected, s"row $i")
    }
  }

  test("float_dot: MISMATCHED lengths → null, matching the composition (was: silent truncation)") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    // old formulation returned 3.0 (partial dot over min(n, m)) — a
    // plausible-but-wrong cosine for a ragged embedding; the
    // composition yields NULL (zip_with pads with nulls), and the
    // native expression must agree on BOTH engine paths
    val both = df.select(
      expr("float_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "0D, (acc, v) -> acc + v)").as("composed"))
    val r = both.head()
    assert(r.isNullAt(0), s"native returned ${r.get(0)} on ragged input")
    assert(r.isNullAt(1), "composition contract changed?")
    // interpreted path too (codegen fallback must not diverge)
    val fd = FloatDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 1.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(fd.eval(null) == null && fd.nullable)
  }

  test("float_dot: null ELEMENT → null, matching the composition (was: silent 0 contribution)") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    // r15 functions review: a corrupt null slot previously contributed
    // 0 — a plausible-but-wrong partial dot, the same defect class the
    // ragged-length rule exists to surface — and diverged from the
    // composition, whose null product poisons the sum
    val df = Seq(1L).toDF("id").select(
      expr("CAST(array(1.0F, NULL, 3.0F) AS ARRAY<FLOAT>)").as("a"),
      expr("CAST(array(1.0F, 1.0F, 1.0F) AS ARRAY<FLOAT>)").as("b"))
    val both = df.select(
      expr("float_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "0D, (acc, v) -> acc + v)").as("composed"))
    val r = both.head()
    assert(r.isNullAt(0), s"native returned ${r.get(0)} on a null element")
    assert(r.isNullAt(1), "composition contract changed?")
    // and a clean pair on the same plan still computes (non-vacuous)
    val clean = df.select(expr("float_dot(b, b)")).head()
    assert(clean.getDouble(0) == 3.0)
  }

  test("float_dot: wrong arity fails with the function name, not IndexOutOfBounds") {
    val s = spark
    GraftFunctions.ensureRegistered(s)
    val ex = intercept[Exception] {
      s.sql("SELECT float_dot(array(1.0F))").head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("float_dot") && m.contains("2 argument")),
      s"arity error lacks name/arity: ${msgs(ex).mkString(" | ")}")
  }

  test("float_dot: null array → null; registered via extensions class too") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(expr("float_dot(a, b)")).head().isNullAt(0))
    // SparkSessionExtensions route actually injects (apply must not
    // throw and must register both functions into the container)
    val container = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(container)
  }

  test("float_dot participates in whole-stage codegen (plan check)") {
    val s = spark; import s.implicits._
    GraftFunctions.ensureRegistered(s)
    // spark.range keeps the projection in the physical plan (a local
    // Seq would be constant-folded into a LocalTableScan)
    val df = s.range(1, 100)
      .select(expr("transform(sequence(0, 63), i -> CAST(i * id AS FLOAT))").as("a"))
      .select(expr("float_dot(a, a)").as("d"))
    // `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[float_dot.*"), plan)
    // dot(a,a) for id=1: sum of i^2, i=0..63 = 85344
    assert(df.head().getDouble(0) == 85344.0)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TEMPORARY r21 experiment harness: A/B the q142/q177 checkpoint
  * placements in ONE JVM (one calibration window, interleaved reps)
  * per VERDICT r20 #1/#2. Self-contained copies of the DedupOps
  * internals — the winner gets folded back into DedupOps and this file
  * is deleted before the round closes. Not part of SparkEntry.queries.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ExpDedup <reps> [variant...]
  */
object ExpDedup {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** The derived corpus (base + 85%-prefix twin), tokenized. */
  private def derivedToks(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val u = base.unionByName(
      base.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("slice(toks, 1, greatest(3, CAST((17 * size(toks) + 19) DIV 20 AS INT)))")
          .as("toks")))
    sys.env.getOrElse("GRAFT_EXP_SPREAD", "col") match {
      case "none" => u
      case "fixed" => u.repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      case _ => u.repartition(col("doc_id"))
    }
  }

  /** r20 shape: one array row per doc, eagerly checkpointed. */
  private def arrsCkpt(s: SparkSession, dir: String): DataFrame =
    derivedToks(s, dir)
      .select(
        col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3))))").as("arr"))
      .localCheckpoint()

  private def explSh(arrs: DataFrame): DataFrame =
    arrs.select(
      col("doc_id"), size(col("arr")).cast("long").as("n"),
      explode(col("arr")).as("sh"))

  // ---------- q177 variants ----------

  private def q177From(sh: DataFrame, dfreq: DataFrame, arrs: DataFrame): DataFrame = {
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = sh.join(dfreq, "sh")
      .select(col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= expr("n - (8 * n + 9) DIV 10 + 1"))
      .select(col("doc_id").as("da"), col("sh"), col("n").as("na"))
    val cand = prefix
      .join(sh.select(col("doc_id").as("db"), col("sh")), Seq("sh"))
      .filter(col("da") =!= col("db"))
      .select("da", "db", "na").distinct()
    cand
      .join(arrs.select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(arrs.select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .filter(col("inter") * 10 >= col("na") * 8)
      .select(col("da"), col("db"),
        round(col("inter") / col("na").cast("double"), 6).as("containment"))
  }

  /** v0: current r20 shape — arrs ckpt, exploded view re-derived per consumer. */
  private def q177_v0(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val sh = explSh(arrs)
    q177From(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")), arrs)
  }

  /** v1: arrs ckpt + exploded view checkpointed ONCE (verdict fix). */
  private def q177_v1(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val sh = explSh(arrs).localCheckpoint()
    q177From(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")), arrs)
  }

  /** v2: arrs ckpt + exploded view WITH df attached by a window over sh
    * (no dfreq aggregate+join at all), checkpointed once.
    */
  private def q177_v2(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val shW = explSh(arrs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .localCheckpoint()
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = shW
      .select(col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= expr("n - (8 * n + 9) DIV 10 + 1"))
      .select(col("doc_id").as("da"), col("sh"), col("n").as("na"))
    val cand = prefix
      .join(shW.select(col("doc_id").as("db"), col("sh")), Seq("sh"))
      .filter(col("da") =!= col("db"))
      .select("da", "db", "na").distinct()
    cand
      .join(arrs.select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(arrs.select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .filter(col("inter") * 10 >= col("na") * 8)
      .select(col("da"), col("db"),
        round(col("inter") / col("na").cast("double"), 6).as("containment"))
  }

  /** v3: the r19 shape — exploded distinct stream checkpointed, n via
    * count-over-doc window, verify arrays re-aggregated per side.
    */
  private def q177_v3(s: SparkSession, dir: String): DataFrame = {
    val sh = derivedToks(s, dir)
      .select(
        col("doc_id"),
        explode(expr("transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3)))")).as("sh"))
      .distinct()
      .localCheckpoint()
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val wDoc = Window.partitionBy("doc_id")
    val prefix = sh.join(dfreq, "sh")
      .select(col("doc_id"), col("sh"),
        row_number().over(wPos).as("pos"),
        count(lit(1)).over(wDoc).as("n"))
      .filter(col("pos") <= expr("n - (8 * n + 9) DIV 10 + 1"))
      .select(col("doc_id").as("da"), col("sh"), col("n").as("na"))
    val cand = prefix
      .join(sh.select(col("doc_id").as("db"), col("sh")), Seq("sh"))
      .filter(col("da") =!= col("db"))
      .select("da", "db", "na").distinct()
    val arrs = sh.groupBy("doc_id").agg(collect_list(col("sh")).as("arr"))
    cand
      .join(arrs.select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(arrs.select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .filter(col("inter") * 10 >= col("na") * 8)
      .select(col("da"), col("db"),
        round(col("inter") / col("na").cast("double"), 6).as("containment"))
  }

  // ---------- q142 variants ----------

  private def q142From(prefix: DataFrame, arrs: DataFrame): DataFrame = {
    val cand = prefix.as("a")
      .join(
        prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * 10 >= col("a.n") * 7 && col("a.n") * 10 >= col("b.n") * 7)
      .select(
        col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    cand
      .join(arrs.select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(arrs.select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / (na + nb - inter)"))
      .filter(col("jaccard") >= 0.7)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
  }

  private def q142Prefix(sh: DataFrame, dfreq: DataFrame): DataFrame = {
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    sh.join(dfreq, "sh")
      .select(
        col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + 1)
      .select(col("doc_id"), col("sh"), col("n"))
  }

  /** p0: current r20 shape — arrs ckpt + prefix ckpt. */
  private def q142_p0(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val sh = explSh(arrs)
    val prefix = q142Prefix(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")))
      .localCheckpoint()
    q142From(prefix, arrs)
  }

  /** p1: arrs ckpt + sh ckpt + prefix ckpt. */
  private def q142_p1(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val sh = explSh(arrs).localCheckpoint()
    val prefix = q142Prefix(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")))
      .localCheckpoint()
    q142From(prefix, arrs)
  }

  /** p2: arrs ckpt + sh ckpt, prefix NOT checkpointed (pipeline runs
    * once per self-join side, but from the materialized stream).
    */
  private def q142_p2(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val sh = explSh(arrs).localCheckpoint()
    val prefix = q142Prefix(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")))
    q142From(prefix, arrs)
  }

  /** p3: arrs ckpt + window-df stream ckpt + prefix ckpt (no dfreq join). */
  private def q142_p3(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val shW = explSh(arrs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .localCheckpoint()
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = shW
      .select(
        col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + 1)
      .select(col("doc_id"), col("sh"), col("n"))
      .localCheckpoint()
    q142From(prefix, arrs)
  }

  /** p4: arrs ckpt ONLY — prefix pipeline re-derived per self-join side. */
  private def q142_p4(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val sh = explSh(arrs)
    val prefix = q142Prefix(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")))
    q142From(prefix, arrs)
  }

  /** p6: NO checkpoint anywhere — everything re-derives from the scan. */
  private def q142_p6(s: SparkSession, dir: String): DataFrame = {
    val arrs = derivedToks(s, dir)
      .select(
        col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3))))").as("arr"))
    val sh = explSh(arrs)
    val prefix = q142Prefix(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")))
    q142From(prefix, arrs)
  }

  /** p7: prefix ckpt ONLY — arrays re-derived from the scan per verify side. */
  private def q142_p7(s: SparkSession, dir: String): DataFrame = {
    val arrs = derivedToks(s, dir)
      .select(
        col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3))))").as("arr"))
    val sh = explSh(arrs)
    val prefix = q142Prefix(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")))
      .localCheckpoint()
    q142From(prefix, arrs)
  }

  /** v4: q177 with NO checkpoint anywhere. */
  private def q177_v4(s: SparkSession, dir: String): DataFrame = {
    val arrs = derivedToks(s, dir)
      .select(
        col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3))))").as("arr"))
    val sh = explSh(arrs)
    q177From(sh, sh.groupBy("sh").agg(count(lit(1)).as("df")), arrs)
  }

  /** p8: arrs ckpt + window-df stream ckpt, prefix NOT checkpointed
    * (the v2 shape applied to q142).
    */
  private def q142_p8(s: SparkSession, dir: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val shW = explSh(arrs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .localCheckpoint()
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = shW
      .select(
        col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + 1)
      .select(col("doc_id"), col("sh"), col("n"))
    q142From(prefix, arrs)
  }

  /** p5: r19 shape — exploded distinct ckpt, windows for n, collect_list verify. */
  private def q142_p5(s: SparkSession, dir: String): DataFrame = {
    val sh = derivedToks(s, dir)
      .select(
        col("doc_id"),
        explode(expr("transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3)))")).as("sh"))
      .distinct()
      .localCheckpoint()
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val wDoc = Window.partitionBy("doc_id")
    val prefix = sh.join(dfreq, "sh")
      .select(
        col("doc_id"), col("sh"),
        row_number().over(wPos).as("pos"),
        count(lit(1)).over(wDoc).as("n"))
      .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + 1)
      .select(col("doc_id"), col("sh"), col("n"))
      .localCheckpoint()
    val arrs = sh.groupBy("doc_id").agg(collect_list(col("sh")).as("arr"))
    q142From(prefix, arrs)
  }

  /** Production containment shape with a join-strategy hint on the
    * verify joins' array side ("merge" | "shuffle_hash" | "" = as-is).
    */
  private def q177Hint(s: SparkSession, dir: String, hint: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val shW = explSh(arrs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .localCheckpoint()
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = shW
      .select(col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= expr("n - (8 * n + 9) DIV 10 + 1"))
      .select(col("doc_id").as("da"), col("sh"), col("n").as("na"))
    val shC = if (hint == "candmerge") shW.hint("merge") else shW
    val cand = prefix
      .join(shC.select(col("doc_id").as("db"), col("sh")), Seq("sh"))
      .filter(col("da") =!= col("db"))
      .select("da", "db", "na").distinct()
    val av = if (hint.isEmpty || hint == "candmerge") arrs.hint("merge") else arrs.hint(hint)
    cand
      .join(av.select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(av.select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .filter(col("inter") * 10 >= col("na") * 8)
      .select(col("da"), col("db"),
        round(col("inter") / col("na").cast("double"), 6).as("containment"))
  }

  private def q142Hint(s: SparkSession, dir: String, hint: String): DataFrame = {
    val arrs = arrsCkpt(s, dir)
    val shW = explSh(arrs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .localCheckpoint()
    val wPos = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = shW
      .select(
        col("doc_id"), col("sh"), col("n"),
        row_number().over(wPos).as("pos"))
      .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + 1)
      .select(col("doc_id"), col("sh"), col("n"))
    val cand = prefix.as("a")
      .join(
        prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * 10 >= col("a.n") * 7 && col("a.n") * 10 >= col("b.n") * 7)
      .select(
        col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    val av = if (hint.isEmpty) arrs else arrs.hint(hint)
    cand
      .join(av.select(col("doc_id").as("da"), col("arr").as("arr_a")), "da")
      .join(av.select(col("doc_id").as("db"), col("arr").as("arr_b")), "db")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / (na + nb - inter)"))
      .filter(col("jaccard") >= 0.7)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------- q155 bucketed-edges experiment (VERDICT r20 #5) ----------

  private def tradeEdgesCopy(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  private def lpaRounds(edges: DataFrame): DataFrame = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    for (_ <- 1 to 3) {
      labels = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("dst").as("id"), (-col("m.neg")).as("lbl"))
    }
    labels.select(
      col("id").as("node_id"), col("lbl").as("community"),
      count(lit(1)).over(Window.partitionBy("lbl")).cast("bigint")
        .as("community_size"))
  }

  /** Current q155 shape: edges localCheckpoint, 3 join+agg rounds. */
  private def q155_cur(s: SparkSession, dir: String): DataFrame =
    lpaRounds(tradeEdgesCopy(s, dir).localCheckpoint())

  /** Bucketed variant: edges written ONCE as a src-bucketed catalog
    * table inside the timed query, read per round — the per-round
    * edges-side exchange disappears (the join reads bucketed scans).
    */
  private def q155_bucketed(s: SparkSession, dir: String): DataFrame = {
    val n = s.sparkContext.defaultParallelism
    s.sql("DROP TABLE IF EXISTS exp155_edges")
    tradeEdgesCopy(s, dir)
      .write.mode("overwrite")
      .bucketBy(n, "src").sortBy("src")
      .format("parquet")
      .saveAsTable("exp155_edges")
    lpaRounds(s.table("exp155_edges"))
  }

  /** The derivedShingleArrays CHECKPOINT-BUILD expression (production
    * body minus the eager localCheckpoint) — dumped so plans/r21 can
    * account for the exchanges that run eagerly behind the boundary
    * (VERDICT r20 #2: "dump the checkpoint build's plan too").
    */
  private def buildArrs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val derived = base.unionByName(
      base.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("slice(toks, 1, greatest(3, CAST((17 * size(toks) + 19) DIV 20 AS INT)))")
          .as("toks")))
    val n = s.sparkContext.defaultParallelism
    val spreadDf =
      if (derived.rdd.getNumPartitions * 8 <= n)
        derived.repartition(n, col("doc_id"))
      else derived
    spreadDf.select(
      col("doc_id"),
      expr("array_distinct(transform(sequence(1, size(toks) - 2), " +
        "i -> concat_ws(' ', slice(toks, i, 3))))").as("arr"))
  }

  /** The exploded-stream CHECKPOINT-BUILD expression, reading the real
    * production array checkpoint.
    */
  private def buildShW(s: SparkSession, dir: String): DataFrame =
    graft.operators.DedupOps.derivedShingleArrays(s, dir)
      .select(
        col("doc_id"), size(col("arr")).cast("long").as("n"),
        explode(col("arr")).as("sh"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))

  private val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "build_arrs" -> buildArrs _,
    "build_shw" -> buildShW _,
    "q155_cur" -> q155_cur _,
    "q155_bucketed" -> q155_bucketed _,
    "q177_cm" -> ((s: SparkSession, dir: String) => q177Hint(s, dir, "candmerge")),
    "q177_hb" -> ((s: SparkSession, dir: String) => q177Hint(s, dir, "")),
    "q177_hm" -> ((s: SparkSession, dir: String) => q177Hint(s, dir, "merge")),
    "q177_hh" -> ((s: SparkSession, dir: String) => q177Hint(s, dir, "shuffle_hash")),
    "q142_hb" -> ((s: SparkSession, dir: String) => q142Hint(s, dir, "")),
    "q142_hm" -> ((s: SparkSession, dir: String) => q142Hint(s, dir, "merge")),
    "q142_hh" -> ((s: SparkSession, dir: String) => q142Hint(s, dir, "shuffle_hash")),
    // production sub-frame probes (read the real DedupOps internals)
    "prod177_sh" -> ((s: SparkSession, dir: String) =>
      graft.operators.DedupOps.containmentFrames(s, dir)._1),
    "prod177_prefix" -> ((s: SparkSession, dir: String) =>
      graft.operators.DedupOps.containmentFrames(s, dir)._2),
    "prod177_cand" -> ((s: SparkSession, dir: String) =>
      graft.operators.DedupOps.containmentFrames(s, dir)._3),
    "prod177_full" -> ((s: SparkSession, dir: String) =>
      graft.operators.DedupOps.containmentFrames(s, dir)._4),
    "prod142_prefix" -> ((s: SparkSession, dir: String) =>
      graft.operators.DedupOps.ppjoinFrames(s, dir)._2),
    "prod142_cand" -> ((s: SparkSession, dir: String) =>
      graft.operators.DedupOps.ppjoinFrames(s, dir)._3),
    "prod142_full" -> ((s: SparkSession, dir: String) =>
      graft.operators.DedupOps.ppjoinFrames(s, dir)._4),
    "q177_v0" -> q177_v0 _,
    "q177_v1" -> q177_v1 _,
    "q177_v2" -> q177_v2 _,
    "q177_v3" -> q177_v3 _,
    "q177_v4" -> q177_v4 _,
    "q142_p0" -> q142_p0 _,
    "q142_p6" -> q142_p6 _,
    "q142_p8" -> q142_p8 _,
    "q142_p7" -> q142_p7 _,
    "q142_p1" -> q142_p1 _,
    "q142_p2" -> q142_p2 _,
    "q142_p3" -> q142_p3 _,
    "q142_p4" -> q142_p4 _,
    "q142_p5" -> q142_p5 _,
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    val nominal = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val pick = args.drop(1).toSet
    val sel = variants.filter(v => pick.isEmpty || pick.contains(v._1))
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    println(f"== cal pre: effective_cores=${Bench.effectiveCores(nominal)._1}%.1f")
    // result-identity gate: every variant of a query must agree on
    // count + order-independent checksum
    sel.filter(_._1.startsWith("q")).groupBy(_._1.take(4)).foreach { case (_, vs) =>
      val sums = vs.map { case (name, fn) =>
        val df = fn(spark, sfDir)
        val c = df.count()
        val h = df.select(bit_xor(xxhash64(df.columns.map(col): _*)).as("h"))
          .collect()(0).getLong(0)
        name -> ((c, h))
      }
      println(s"[exp] identity: ${sums.map { case (n, (c, h)) => s"$n rows=$c h=$h" }.mkString(" | ")}")
      require(sums.map(_._2).distinct.size == 1, "VARIANTS DISAGREE")
    }
    if (explain) sel.foreach { case (name, fn) =>
      println(s"==== plan $name ====")
      fn(spark, sfDir).explain("formatted")
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; (name, fn) <- sel) {
      spark.sparkContext.setJobDescription(s"$name rep$r")
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = times.getOrElse(name, Nil) :+ t
      println(f"[exp] $name rep$r $t%.3f s")
    }
    println(f"== cal post: effective_cores=${Bench.effectiveCores(nominal)._1}%.1f")
    sel.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[exp] SUMMARY $name min=${ts.min}%.3f warmmin=${ts.drop(1).min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

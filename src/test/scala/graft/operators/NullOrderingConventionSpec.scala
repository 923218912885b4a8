package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, LeafNode, LogicalPlan, Project, Sort, Union}
import org.apache.spark.sql.functions._

/** Mechanical enforcement of the cross-engine NULL-ordering convention
  * (the r17 q179 find, mechanized per VERDICT r17 #1).
  *
  * Spark sorts ASC with NULLS FIRST by default; DuckDB sorts NULLS
  * LAST in BOTH directions (pinned empirically on the oracle build:
  * ASC [1, 2, NULL], DESC [2, 1, NULL], identically inside window
  * ORDER BYs). So any VALUE-AFFECTING sort on a genuinely nullable
  * NULLS-FIRST key — a window ordering feeding rank/midrank/cumulative
  * frames, an ORDER BY under a LIMIT cut, a sort feeding stateful
  * per-partition logic — silently diverges cross-engine the moment a
  * NULL reaches the key: no error, no gate failure (the fixtures carry
  * ZERO NULLs, verified column-by-column at sf0.01, so the oracle gate
  * is structurally blind — exactly like the ANSI division class), just
  * shifted ranks. q179's NULL-bin midrank shift was found by HAND in
  * r17; this spec is that sweep as a machine, in the
  * DivisionConventionSpec mold: walk every declared query's ANALYZED
  * plan and flag any SortOrder with nullOrdering = NullsFirst (the
  * divergent placement: Spark's ASC default, or an explicit
  * desc_nulls_first) whose key is not provably non-NULL.
  *
  * Spark's own static `nullable` is useless here — it hardcodes TRUE
  * for cast/floor/md5/datediff/pmod even over non-nullable inputs — so
  * the detector carries its own null-propagation evaluator, leaning on
  * the session's ANSI contract: under ANSI, CAST / division /
  * element_at THROW on bad non-null input instead of returning NULL,
  * which makes them NULL-PRESERVING-TOTAL (non-null in → non-null out,
  * or no row at all). A key is proven non-null by:
  *
  *  - being a non-null literal, a total function of proven inputs
  *    (arithmetic, ANSI casts, hashes, string/date kernels — the
  *    pinned whitelist in [[nonNull]]), a rank-family window function,
  *    or a grouped MAX/MIN/SUM/AVG/FIRST/LAST over a proven child (a
  *    grouped aggregate's group exists only with ≥ 1 row);
  *  - a SUBTREE-SCOPED null-rejecting Filter / Inner-join / semi-join
  *    condition below the sorting operator (`x.isNotNull`, any
  *    comparison, IN — a NULL key makes the predicate NULL and drops
  *    the row; the q179 fix shape). Facts are deliberately NOT
  *    plan-global: a join ABOVE a window that would eventually drop
  *    the NULL rows does not un-shift the ranks the window already
  *    assigned (the q124 histogram shape this spec's first walk
  *    surfaced);
  *  - the DATA CONTRACT: the key's leaves all trace to parquet-scan
  *    columns the engine contracts non-null — every TPC-H-table column
  *    (the TPC-H spec declares all columns NOT NULL) plus the
  *    synthetic tables' identity/type/time spine (doc_id, event_id,
  *    user_id, ts, event_type, vec_id: a row without identity, time,
  *    or its routing type is ingest-reject territory by the q45 loud
  *    convention). PAYLOAD columns (value, props, text, lang, source,
  *    n_chars, embedding, label) are deliberately NOT contracted —
  *    measurements and crawled payloads are exactly where 100 TB
  *    production NULLs live. Attributes riding the null side of an
  *    OUTER join or the output of a UNION (whose branches mix rows
  *    under the first branch's ExprIds) are excluded from every
  *    attribute-level proof path;
  *  - or an allowlist entry below with a written structural reason,
  *    pinned to the exact key-SQL set it excuses (dead entries and new
  *    riders both fail — the OracleConventionSpec exemption
  *    discipline).
  *
  * SCOPE — value-affecting sorts only. A Sort whose path to the plan
  * root crosses only Project/Sort nodes is PRESENTATION ordering: the
  * driver's checker canonicalizes row order on both sides
  * (tools/check.py canon()), so final-output NULL placement cannot
  * diverge a compared value; flagging ~150 presentation orderBys would
  * bury the real class in allowlist noise. Everything else — window
  * orderSpecs, sorts under Limit, sorts feeding typed per-partition
  * logic, sorts inside subqueries — is scanned. NullsLast keys agree
  * with DuckDB in both directions and are safe by construction.
  * Array-function ordering (array_sort/sort_array NULL placement) is a
  * different, non-SortOrder surface: no declared query sorts arrays
  * with nullable elements (the cosine/top-k paths filter NULL
  * similarities before every cut).
  */
class NullOrderingConventionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Base parquet columns the engine CONTRACTS non-null (class doc). */
  private val contractNonNull: Set[String] = Set(
    // TPC-H spec tables: every column NOT NULL per the spec
    "r_regionkey", "r_name",
    "n_nationkey", "n_name", "n_regionkey",
    "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    "s_suppkey", "s_name", "s_nationkey", "s_acctbal",
    "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
    // synthetic tables: identity/type/time spine only — payloads stay
    // nullable (value, props, text, lang, source, n_chars, embedding,
    // label)
    "doc_id", "event_id", "user_id", "ts", "event_type", "vec_id")

  /** query -> (why each pinned NullsFirst key cannot carry a NULL, the
    * exact key-SQL set excused). Three of the four are CHECKPOINT
    * OPACITY, not semantics: localCheckpoint truncates lineage to a
    * LogicalRDD leaf, so the scan cannot trace a key it could
    * otherwise prove — the reason must spell out the pre-checkpoint
    * derivation.
    */
  private val structurallySafeOrder: Map[String, (String, Set[String])] = Map(
    "q190_path_trigrams" -> ("e2 = LEAD(event_type, 1) under the e3 = LEAD(event_type, 2) isNotNull filter: event_type is contract non-null, so LEAD(k) is NULL only past the partition end — NULL-monotone in k, and e3 non-null implies row i+1 exists, hence e2 non-null",
      Set("e2")),
    "q150_quantile_shard_merge" -> ("bin crosses the persisted shard-state localCheckpoint (LogicalRDD — untraceable); it is floor(o_totalprice / 5000.0) via an ANSI cast, total over the contract-non-null o_totalprice",
      Set("bin")),
    "q149_concurrency_sweep" -> ("all three keys cross the boundary-list localCheckpoint: ts = grouped MIN/MAX over the contract-non-null events.ts, hr = date_trunc('HOUR', ts) (total, literal format), user_id is contract non-null",
      Set("hr", "ts", "user_id")),
    "q195_kmv_intersect" -> ("h crosses the distinct-users localCheckpoint; it is xxhash64(user_id) — non-null by construction (Spark hashes treat NULL input as a value, never returning NULL)",
      Set("h")),
  )

  // ---------------------------------------------------------------- //
  // facts                                                            //
  // ---------------------------------------------------------------- //

  private final class Facts(
      val aliases: Map[ExprId, (Expression, Boolean)], // defn, insideGroupedAgg
      val leafCols: Map[ExprId, String], // parquet-scan leaves only
      val outerNullable: Set[ExprId],
      val genNonNull: Set[ExprId]) {
    // per-consumer-subtree null-rejection facts, memoized by node identity
    private val cache = scala.collection.mutable.Map.empty[LogicalPlan, (Set[ExprId], Seq[Expression])]
    def subtreeNotNull(scope: LogicalPlan): (Set[ExprId], Seq[Expression]) =
      cache.getOrElseUpdate(scope, collectSubtreeNotNull(scope))
    // topmost Union per (scope, exprId) — pre-order collect puts the
    // outermost mixing point first
    private val uCache = scala.collection.mutable.Map.empty[LogicalPlan, Seq[Union]]
    def unionsIn(scope: LogicalPlan): Seq[Union] =
      uCache.getOrElseUpdate(scope, scope.collect { case u: Union => u })
  }

  /** Expressions proven NON-NULL on rows where `cond` held TRUE: a
    * NULL operand makes every null-intolerant predicate NULL, and a
    * Filter/Join keeps only TRUE rows. From each proven root, children
    * of null-intolerant nodes are proven too (a non-NULL result
    * implies every null-intolerant input was non-NULL).
    */
  private def nullRejected(cond: Expression): Seq[Expression] = {
    def unwrap(e: Expression): Seq[Expression] =
      if (e.nullIntolerant) e +: e.children.flatMap(unwrap) else Seq(e)
    cond match {
      case And(a, b) => nullRejected(a) ++ nullRejected(b)
      case IsNotNull(e) => unwrap(e)
      case _: EqualNullSafe => Nil // <=> passes NULL pairs through
      case bc: BinaryComparison => unwrap(bc.left) ++ unwrap(bc.right)
      case In(v, _) => unwrap(v)
      case InSet(v, _) => unwrap(v)
      case sp: StringPredicate => unwrap(sp.left) ++ unwrap(sp.right)
      case l: Like => unwrap(l.left)
      case r: RLike => unwrap(r.left)
      case _ => Nil
    }
  }

  /** Null-rejection facts from Filter/Join conditions INSIDE `scope` —
    * everything in the subtree runs before the consumer sorts, so its
    * facts hold for every row the sort sees. The walk STOPS at Union
    * nodes: rows from every branch mix under the first branch's
    * ExprIds, so a branch-local filter proves nothing about the
    * union's output (the per-branch proof in [[nonNull]] handles
    * unions soundly instead).
    */
  private def collectSubtreeNotNull(scope: LogicalPlan): (Set[ExprId], Seq[Expression]) = {
    val ids = scala.collection.mutable.Set.empty[ExprId]
    val glob = scala.collection.mutable.Buffer.empty[Expression]
    def addProven(x: Expression): Unit = {
      glob += x
      x match {
        case ar: AttributeReference => ids += ar.exprId
        case _ => ()
      }
    }
    def go(node: LogicalPlan): Unit = node match {
      case _: Union => () // stop: facts below the mix don't bind its output
      case f: Filter =>
        nullRejected(f.condition).foreach(addProven); go(f.child)
      case j: Join =>
        j.joinType match {
          case Inner | Cross =>
            j.condition.toSeq.flatMap(nullRejected).foreach(addProven)
          case LeftSemi =>
            // only left-side attrs survive a semi join's output
            val leftIds = j.left.outputSet
            j.condition.toSeq.flatMap(nullRejected).foreach {
              case ar: AttributeReference if leftIds.contains(ar) => addProven(ar)
              case _ => ()
            }
          case _ => ()
        }
        j.children.foreach(go)
      case other => other.children.foreach(go)
    }
    go(scope)
    (ids.toSet, glob.toSeq)
  }

  private def collectFacts(plan: LogicalPlan): Facts = {
    val aliases = scala.collection.mutable.Map.empty[ExprId, (Expression, Boolean)]
    val leafCols = scala.collection.mutable.Map.empty[ExprId, String]
    val outerNullable = scala.collection.mutable.Set.empty[ExprId]
    val genNonNull = scala.collection.mutable.Set.empty[ExprId]

    plan.collectWithSubqueries { case node =>
      val grouped = node match {
        case a: Aggregate => a.groupingExpressions.nonEmpty
        case _ => false
      }
      node.expressions.foreach { root =>
        root.foreach {
          case a: Alias => aliases(a.exprId) = (a.child, grouped)
          case _ => ()
        }
      }
      node match {
        case j: Join =>
          j.joinType match {
            case LeftOuter => outerNullable ++= j.right.output.map(_.exprId)
            case RightOuter => outerNullable ++= j.left.output.map(_.exprId)
            case FullOuter =>
              outerNullable ++= (j.left.output ++ j.right.output).map(_.exprId)
            case _ => ()
          }
        case g: Generate if !g.outer =>
          // explode/posexplode emit no row for a NULL collection; the
          // ELEMENT is non-null when the collection provably holds no
          // null elements: containsNull = false (split/sequence), or a
          // regexp_extract_all (its matches are never null strings —
          // Spark types it containsNull = true conservatively)
          def elementsNonNull(col: Expression): Boolean = col.dataType match {
            case at: org.apache.spark.sql.types.ArrayType if !at.containsNull => true
            case _ => col match {
              case a: Alias => elementsNonNull(a.child)
              case ar: AttributeReference =>
                aliases.get(ar.exprId).exists(d => elementsNonNull(d._1))
              case _: RegExpExtractAll => true
              case _ => false
            }
          }
          g.generator match {
            case e: Explode =>
              if (elementsNonNull(e.child)) genNonNull ++= g.generatorOutput.map(_.exprId)
            case e: PosExplode =>
              // pos is always non-null; the element needs the proof
              g.generatorOutput.headOption.foreach(a => genNonNull += a.exprId)
              if (elementsNonNull(e.child)) genNonNull ++= g.generatorOutput.map(_.exprId)
            case _ => ()
          }
        case leaf: LeafNode =>
          // contract columns are matched ONLY on real source scans: a
          // LogicalRDD (localCheckpoint) or LocalRelation column that
          // happens to share a contract name proves nothing
          val cn = leaf.getClass.getSimpleName
          if (cn.contains("LogicalRelation") || cn.contains("DataSourceV2Relation"))
            leaf.output.foreach(a => leafCols(a.exprId) = a.name)
        case _ => ()
      }
    }
    new Facts(aliases.toMap, leafCols.toMap, outerNullable.toSet, genNonNull.toSet)
  }

  // ---------------------------------------------------------------- //
  // the null-propagation evaluator                                   //
  // ---------------------------------------------------------------- //

  /** True iff `e` is provably non-NULL for every row `scope` emits.
    * `grouped` is true when `e` sits among a grouped Aggregate's
    * aggregate expressions (its group exists only with ≥ 1 row).
    */
  private def nonNull(
      e: Expression, facts: Facts, scope: LogicalPlan,
      grouped: Boolean, depth: Int): Boolean = {
    if (depth > 24) return false
    lazy val (scopeIds, scopeGlobal) = facts.subtreeNotNull(scope)
    def rec(c: Expression): Boolean =
      nonNull(c, facts, scope, grouped, depth + 1)
    def all(cs: Seq[Expression]): Boolean = cs.forall(rec)
    if (scopeGlobal.exists(_.semanticEquals(e))) return true
    e match {
      case l: Literal => l.value != null
      case a: Alias => rec(a.child)
      case ar: AttributeReference =>
        // a Union inside the scope that outputs this ExprId mixes every
        // branch's rows under it: the attr is proven only if EVERY
        // branch's corresponding output is proven within that branch's
        // own scope (pre-order collect → outermost mixing point first;
        // nested unions recurse through strictly-shrinking scopes)
        facts.unionsIn(scope).find(_.output.exists(_.exprId == ar.exprId)) match {
          case Some(u) =>
            val i = u.output.indexWhere(_.exprId == ar.exprId)
            u.children.forall(ch =>
              nonNull(ch.output(i), facts, ch, grouped = false, depth + 1))
          case None =>
            scopeIds.contains(ar.exprId) ||
              facts.genNonNull.contains(ar.exprId) ||
              (!facts.outerNullable.contains(ar.exprId) && (
                facts.leafCols.get(ar.exprId).exists(contractNonNull.contains) ||
                  facts.aliases.get(ar.exprId).exists { case (defn, g) =>
                    nonNull(defn, facts, scope, g, depth + 1)
                  }))
        }
      // ANSI casts throw on bad non-null input instead of returning
      // NULL (AnsiDivisionSpec pins the mode) — null-preserving-total
      case c: Cast if c.evalMode == EvalMode.ANSI => rec(c.child)
      case co: CheckOverflow => rec(co.child)
      // total arithmetic (ANSI division throws on 0, never NULLs)
      case b @ (_: Add | _: Subtract | _: Multiply) => all(b.children)
      case d: Divide if d.evalMode == EvalMode.ANSI => all(d.children)
      case d: IntegralDivide if d.evalMode == EvalMode.ANSI => all(d.children)
      case d: Remainder if d.evalMode == EvalMode.ANSI => all(d.children)
      case d: Pmod if d.evalMode == EvalMode.ANSI => all(d.children)
      case u: UnaryMinus => rec(u.child)
      case a: Abs => rec(a.child)
      // total math kernels (sqrt/log of a bad domain give NaN/throw
      // paths, never a quiet NULL — log is EXCLUDED: ln(0) is NULL)
      case m @ (_: Floor | _: Ceil | _: Round | _: BRound | _: Exp | _: Sqrt | _: Pow) =>
        all(m.children)
      // hashes of non-null input; xxhash64/murmur3 hash NULL as a value
      case m: Md5 => rec(m.child)
      case _: XxHash64 | _: Murmur3Hash => true
      case c: Crc32 => rec(c.child)
      case s: Sha1 => rec(s.child)
      // string kernels, total over non-null input
      case s @ (_: Length | _: Lower | _: Upper | _: Substring | _: StringTrim |
          _: StringTrimLeft | _: StringTrimRight | _: StringReplace | _: RegExpReplace |
          _: RegExpExtract | _: RegExpExtractAll | _: StringSplit | _: Concat |
          _: StringRepeat | _: StringLPad | _: StringRPad) => all(s.children)
      case _: ConcatWs => true // skips NULL args; never returns NULL
      // date/time kernels: trunc/format NULL only on a bad FORMAT —
      // foldable non-null format literals are checked right here
      case t: TruncTimestamp if t.format.foldable && t.format.eval() != null => rec(t.timestamp)
      case t: TruncDate if t.format.foldable && t.format.eval() != null => rec(t.date)
      case d: DateFormatClass if d.right.foldable && d.right.eval() != null => rec(d.left)
      case d @ (_: DateDiff | _: DateAdd | _: DateSub | _: Year | _: Month |
          _: DayOfMonth | _: DayOfWeek | _: WeekDay | _: Hour | _: Minute | _: Second |
          _: DayOfYear | _: WeekOfYear | _: LastDay | _: UnixDate | _: UnixMicros) =>
        all(d.children)
      // to_date/to_timestamp WITHOUT a user format is a cast from a
      // temporal type — total; the with-format parse can NULL
      case p: ParseToDate if p.format.isEmpty => rec(p.left)
      case p: ParseToTimestamp if p.format.isEmpty => rec(p.left)
      case m: MonotonicallyIncreasingID => true
      case s: SparkPartitionID => true
      case i: If => rec(i.trueValue) && rec(i.falseValue)
      case cw: CaseWhen =>
        cw.branches.forall(b => rec(b._2)) && cw.elseValue.exists(rec)
      case c: Coalesce => c.children.exists(rec) // first non-null wins
      case g: Greatest => g.children.exists(rec) // null-skipping
      case l: Least => l.children.exists(rec)
      case n: NaNvl => all(n.children)
      case _: IsNull | _: IsNotNull | _: Not | _: And | _: Or => true // booleans of the predicate algebra used as keys
      case st: CreateNamedStruct => true // the struct itself (fields carry their own nullability)
      case ca: CreateArray => true
      case s: Size => s.legacySizeOfNull == false || rec(s.child)
      // rank-family window functions are non-null by definition
      case WindowExpression(_: RowNumber | _: Rank | _: DenseRank | _: NTile |
          _: PercentRank | _: CumeDist, _) => true
      case WindowExpression(ae: AggregateExpression, spec) =>
        // a frame INCLUDING the current row is never empty; count is
        // always non-null, the others need a proven child
        val frameHasCurrent = spec.frameSpecification match {
          case SpecifiedWindowFrame(_, lower, upper) =>
            (lower == UnboundedPreceding || lower == CurrentRow ||
              (lower match { case Literal(v: Int, _) => v <= 0; case Literal(v: Long, _) => v <= 0L; case _ => false })) &&
              (upper == UnboundedFollowing || upper == CurrentRow ||
                (upper match { case Literal(v: Int, _) => v >= 0; case Literal(v: Long, _) => v >= 0L; case _ => false }))
          case _ => true // UnspecifiedFrame resolves to default (incl. current)
        }
        ae.aggregateFunction match {
          case _: Count => true
          case f: Max if frameHasCurrent => rec(f.child)
          case f: Min if frameHasCurrent => rec(f.child)
          case f: Sum if frameHasCurrent && ae.filter.isEmpty => rec(f.child)
          case f: Average if frameHasCurrent && ae.filter.isEmpty => rec(f.child)
          case _ => false
        }
      // grouped aggregates: the group exists only with >= 1 row
      case ae: AggregateExpression if grouped && ae.filter.isEmpty && !ae.isDistinct =>
        ae.aggregateFunction match {
          case _: Count => true
          case f: Max => rec(f.child)
          case f: Min => rec(f.child)
          case f: Sum => rec(f.child)
          case f: Average => rec(f.child)
          case f: First if !f.ignoreNulls => rec(f.child)
          case f: Last if !f.ignoreNulls => rec(f.child)
          case _ => false
        }
      case ae: AggregateExpression if ae.aggregateFunction.isInstanceOf[Count] &&
          ae.filter.isEmpty => false // GLOBAL count is non-null but 0-able; irrelevant for ordering — still non-null, actually
      case rr: RuntimeReplaceable =>
        rr.replacement match {
          case w: With => rec(w.children.head)
          case other => rec(other)
        }
      case _ => false
    }
  }

  // ---------------------------------------------------------------- //
  // the walk                                                         //
  // ---------------------------------------------------------------- //

  /** All value-affecting NullsFirst sort keys in `df`'s analyzed plan
    * that are not provably non-null, as key-SQL strings.
    */
  private[operators] def offendingSortKeys(df: DataFrame): Set[String] = {
    val plan = df.queryExecution.analyzed
    val facts = collectFacts(plan)
    val bad = scala.collection.mutable.Set.empty[String]

    def check(so: SortOrder, scope: LogicalPlan, grouped: Boolean): Unit =
      if (so.nullOrdering == NullsFirst &&
          !nonNull(so.child, facts, scope, grouped, 0)) bad += so.child.sql

    def exprSorts(e: Expression, scope: LogicalPlan, grouped: Boolean): Unit = e.foreach {
      case so: SortOrder => check(so, scope, grouped)
      case sq: SubqueryExpression => walk(sq.plan, presentation = false)
      case _ => ()
    }

    def walk(node: LogicalPlan, presentation: Boolean): Unit = node match {
      case s: Sort =>
        if (!presentation) s.order.foreach(check(_, s.child, grouped = false))
        walk(s.child, presentation)
      case p: Project =>
        p.projectList.foreach(exprSorts(_, p.child, grouped = false))
        walk(p.child, presentation)
      case other =>
        val grouped = other match {
          case a: Aggregate => a.groupingExpressions.nonEmpty
          case _ => false
        }
        // scope = the subtree the sorted rows flow out of; for the
        // single-child operators that carry window specs this is the
        // child — for multi-child nodes fall back to the node itself
        // (its own Filter/Join facts are BELOW any expression it hosts)
        val scope = other.children match {
          case Seq(only) => only
          case _ => other
        }
        other.expressions.foreach(exprSorts(_, scope, grouped))
        other.children.foreach(walk(_, presentation = false))
    }

    walk(plan, presentation = true)
    bad.toSet
  }

  // ---------------------------------------------------------------- //
  // falsifiability: the detector itself                              //
  // ---------------------------------------------------------------- //

  test("detector flags a nullable ASC window ordering (red-proof: the exact pre-r17 q179 shape)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0))).toDF("k", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val offender = df.withColumn("cum", sum(col("k")).over(w))
    assert(offendingSortKeys(offender) == Set("v"),
      "the scan must flag a nullable ASC window ordering — if this fails, the gate is blind again")
  }

  test("detector accepts every proof shape the convention prescribes") {
    val s = spark; import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Some(2.0), "a"), (3L, Some(1.0), "b")).toDF("k", "v", "g")
    def ok(q: DataFrame, what: String): Unit = {
      val off = offendingSortKeys(q)
      assert(off.isEmpty, s"$what flagged: $off")
    }
    ok(df.filter(col("v").isNotNull)
      .withColumn("r", row_number().over(W.orderBy("v"))), "isNotNull-filtered key")
    ok(df.filter(col("v") > 0.5)
      .withColumn("r", rank().over(W.orderBy("v"))), "comparison-filtered key (null-rejecting)")
    ok(df.filter(col("v").isNotNull)
      .withColumn("r", row_number().over(W.orderBy(floor(col("v") * 10.0)))),
      "total function of a filtered key (floor/cast — Spark's static nullable is blind here)")
    ok(df.withColumn("r", row_number().over(W.orderBy(asc_nulls_last("v")))),
      "explicit asc_nulls_last (DuckDB's default — agreement)")
    ok(df.withColumn("r", row_number().over(W.orderBy(desc("v")))),
      "DESC default (NullsLast both engines)")
    ok(df.withColumn("r", row_number().over(W.orderBy(coalesce(col("v"), lit(0.0))))),
      "coalesce-closed key")
    ok(df.orderBy("v"), "root presentation sort (checker canonicalizes row order)")
    val t = graft.Tables(spark, sfDir, "orders")
    ok(t.withColumn("r", row_number().over(W.partitionBy("o_custkey").orderBy("o_orderdate"))),
      "contract non-null base column")
    ok(t.withColumn("r",
        row_number().over(W.partitionBy("o_custkey")
          .orderBy(date_trunc("month", col("o_orderdate"))))),
      "date_trunc over a contract column (hardcoded-nullable kernel, proven total)")
    ok(t.groupBy("o_custkey").agg(max("o_orderdate").as("mx"))
      .withColumn("r", row_number().over(W.orderBy("mx"))),
      "grouped max over a contract column")
    ok(t.groupBy(col("o_totalprice").cast("long").as("price"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(W.orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow))),
      "ANSI cast of a contract column as a grouped key (the q191 shape)")
  }

  test("detector is not fooled by NULL-introducers, outer joins, unions, or facts ABOVE the sort") {
    val s = spark; import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val t = graft.Tables(spark, sfDir, "orders")
    // when() with no otherwise introduces NULL on top of a contract column
    val reintroduced = t
      .withColumn("key", when(col("o_totalprice") > 100.0, col("o_orderdate")))
      .withColumn("r", row_number().over(W.orderBy("key")))
    assert(offendingSortKeys(reintroduced).nonEmpty,
      "a NULL-introducing expression over a contract column must flag")
    // a LEFT JOIN makes the right side's contract columns nullable
    val c = graft.Tables(spark, sfDir, "customer")
    val outer = c.join(t, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("r", row_number().over(W.partitionBy("c_custkey").orderBy("o_orderdate")))
    assert(offendingSortKeys(outer).nonEmpty,
      "an outer join's null side must not ride the base-column contract")
    // an ORDER BY + LIMIT cut is VALUE-affecting, not presentation
    val df = Seq((1L, Some(2.0)), (2L, None)).toDF("k", "v")
    assert(offendingSortKeys(df.orderBy("v").limit(1)).nonEmpty,
      "a sort under a LIMIT must scan — the cut picks different rows per engine")
    // a null-rejecting join ABOVE the window must NOT excuse the key
    // (the ranks were already assigned over the NULL rows): the q124
    // histogram shape this spec's first walk surfaced
    val withNulls = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0))).toDF("k", "v")
    val ranked = withNulls.withColumn("r", row_number().over(W.orderBy("v")))
    val joined = ranked.join(withNulls.filter(col("v").isNotNull).select(col("v").as("v2")),
      col("v") === col("v2"))
    assert(offendingSortKeys(joined).contains("v"),
      "facts from a join ABOVE the window must not transfer down — rank shift already happened")
    // a union output attr proves nothing even when one branch filters
    val u = withNulls.filter(col("v").isNotNull)
      .unionByName(withNulls)
      .withColumn("r", row_number().over(W.orderBy("v")))
    assert(offendingSortKeys(u).contains("v"),
      "union outputs mix branch rows under one ExprId — attr proofs must not apply")
  }

  // ---------------------------------------------------------------- //
  // red-proofs of the r18 population fixes: on a degenerate fixture   //
  // carrying NULL payload rows, the NULL rows must drop out WITHOUT   //
  // shifting any surviving row's rank/bucket/prediction. Pre-fix,     //
  // every one of these queries shifted: q124's NULL len bin moved the //
  // exclusive cumulative count (hence the BUCKET) of every length;    //
  // q173/q187's NULL n_chars shifted every row_number/percent_rank in //
  // its source; q31/q170's NULL-label centroid competed in the        //
  // probe/argmin windows.                                             //
  // ---------------------------------------------------------------- //

  test("red-proof: NULL payload rows drop out of q124/q173/q187/q31/q170 without shifting the surviving population") {
    val dirty = java.nio.file.Files.createTempDirectory("graft_nullorder_fixture").toString
    try {
      val docs = graft.Tables(spark, sfDir, "documents")
      val src = docs.select("source").head().getString(0)
      docs.unionByName(spark.sql(
          s"SELECT CAST(999999 AS BIGINT) AS doc_id, CAST(NULL AS STRING) AS text, " +
            s"CAST(NULL AS STRING) AS lang, '$src' AS source, CAST(NULL AS BIGINT) AS n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dirty/documents.parquet")
      graft.Tables(spark, sfDir, "embeddings").unionByName(spark.sql(
          // 999998: valid embedding, NULL label (the unlabeled vector);
          // 999999: all-NULL embedding, valid label (no measurable dim)
          "SELECT CAST(999998 AS BIGINT) AS vec_id, " +
            "transform(sequence(1, 64), x -> CAST(0.25 AS FLOAT)) AS embedding, " +
            "CAST(NULL AS INT) AS label " +
            "UNION ALL SELECT CAST(999999 AS BIGINT), " +
            "transform(sequence(1, 64), x -> CAST(NULL AS FLOAT)), CAST(1 AS INT)"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dirty/embeddings.parquet")
      for (q <- Seq("q124_balanced_resample", "q173_score_calibration",
          "q187_quantile_normalize", "q31_ann_ivf", "q170_classifier_metrics")) {
        val fn = SparkEntry.queries(q)
        val clean = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
        val onDirty = fn(spark, dirty).collect().map(_.toString).sorted.toSeq
        assert(onDirty == clean,
          s"$q: degenerate NULL rows changed the surviving population's output — " +
            s"the population filter regressed (pre-r18 shape). clean=${clean.size} rows, " +
            s"dirty=${onDirty.size} rows, first diff: " +
            clean.zip(onDirty).find(p => p._1 != p._2).orElse(
              Some((s"sizes ${clean.size}", s"${onDirty.size}"))))
      }
    } finally {
      graft.GraftSession.rmTree(new java.io.File(dirty)): Unit
    }
  }

  // ---------------------------------------------------------------- //
  // the gate: every declared query                                   //
  // ---------------------------------------------------------------- //

  test("every declared query's value-affecting NullsFirst sort keys are non-null-proven or exempted with a reason") {
    val offenders = SparkEntry.specs.flatMap { q =>
      try {
        val bad = offendingSortKeys(q.fn(spark, sfDir))
        structurallySafeOrder.get(q.name) match {
          case None =>
            if (bad.nonEmpty) Some(s"${q.name}: ${bad.toSeq.sorted.mkString(", ")}") else None
          case Some((_, pinned)) =>
            if (bad == pinned) None
            else Some(s"${q.name}: exemption pins {${pinned.toSeq.sorted.mkString(", ")}} " +
              s"but scan found {${if (bad.isEmpty) "nothing — dead entry" else bad.toSeq.sorted.mkString(", ")}}")
        }
      } catch {
        case e: Throwable => Some(s"${q.name} (failed to analyze: ${e.getMessage.take(100)})")
      }
    }
    assert(
      offenders.isEmpty,
      s"cross-engine divergent NULL ordering on nullable sort keys (Spark NULLS FIRST, " +
        s"DuckDB NULLS LAST): filter the key isNotNull on both engines (the q179 population " +
        s"fix), pin asc_nulls_last + NULLS LAST on both, or allowlist with the structural " +
        s"reason:\n  " + offenders.mkString("\n  "))
  }
}

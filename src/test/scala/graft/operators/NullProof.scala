package graft.operators

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, LeafNode, LogicalPlan, Union}

/** The shared null-propagation prover behind the cross-engine ordering
  * convention specs ([[NullOrderingConventionSpec]] — SortOrder keys —
  * and [[ArrayOrderingConventionSpec]] — array_sort/sort_array element
  * and struct-field placement). ONE evaluator, used by both walks, so
  * the two gates cannot diverge on what "provably non-NULL" means (the
  * DivisionConventionSpec shared-helper discipline).
  *
  * Extracted verbatim from NullOrderingConventionSpec in r19, with
  * four soundness changes (the first three are the r18 ADVICE items,
  * each red-proofed in NullOrderingConventionSpec):
  *
  *  - `size(x)`: non-null when legacySizeOfNull is TRUE (returns -1
  *    for a NULL collection); under the modern default (false) it
  *    needs a proven child. The pre-r19 branch had the condition
  *    inverted, proving exactly the unsound direction.
  *  - `NOT`/`AND`/`OR`: three-valued logic returns NULL on NULL
  *    operands (NOT NULL = NULL, NULL AND TRUE = NULL), so they now
  *    require every child proven. IsNull/IsNotNull stay
  *    unconditionally non-null. Null-intolerant comparisons over
  *    proven operands are proven too (a comparison of two non-NULLs
  *    is always TRUE/FALSE) — EqualNullSafe is total outright.
  *  - `concat_ws`: NULL-skipping over its ARGUMENTS but NULL when the
  *    SEPARATOR (first child) is NULL — the separator now needs the
  *    proof.
  *  - a static fast path: Spark's `nullable = false` claims are sound
  *    (codegen elides null checks on them; an unsound false would be
  *    a Spark correctness bug) — only the TRUE direction is useless
  *    noise (hardcoded for cast/floor/md5/datediff). Trusting the
  *    false direction lets proofs cross localCheckpoint boundaries
  *    whenever the pre-checkpoint plan already typed the column
  *    non-nullable (LogicalRDD preserves schema nullability), which
  *    retired the q195 allowlist entry (xxhash64 types non-nullable).
  *    Bare AttributeReferences are EXCLUDED from the fast path: an
  *    attribute instance resolved before an outer join can carry a
  *    stale nullable=false for rows the join later null-extends — the
  *    attr case below consults the outer-join facts instead. Since
  *    r20 (r19 ADVICE) COMPOSITES carry the same guard: length(x)
  *    over such a stale instance inherits nullable=false wholesale,
  *    so the fast path also requires every referenced attr clear of
  *    the outer-join facts, else the expression proves itself through
  *    the kernel rules below.
  */
private[operators] object NullProof {

  /** Base parquet columns the engine CONTRACTS non-null: every TPC-H
    * table column (the TPC-H spec declares all columns NOT NULL) plus
    * the synthetic tables' identity/type/time spine. PAYLOAD columns
    * (value, props, text, lang, source, n_chars, embedding, label) are
    * deliberately NOT contracted — measurements and crawled payloads
    * are exactly where 100 TB production NULLs live.
    */
  val contractNonNull: Set[String] = Set(
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
    "doc_id", "event_id", "user_id", "ts", "event_type", "vec_id")

  final class Facts(
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
  def nullRejected(cond: Expression): Seq[Expression] = {
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

  /** Follow Alias / single-definition AttributeReference chains to the
    * defining expression. Union-output attrs stop the chase (branch
    * rows mix under the first branch's ExprIds — resolving would read
    * one branch's definition for every branch's rows). Shared by the
    * array-ordering, bounded-global-window, and top-k-determinism
    * walks (r20 — extracted from ArrayOrderingConventionSpec so the
    * walks cannot diverge on what "the defining expression" means).
    */
  private[operators] def resolveDefn(
      e: Expression, facts: Facts, scope: LogicalPlan, depth: Int = 0): Expression =
    e match {
      case a: Alias if depth < 16 => resolveDefn(a.child, facts, scope, depth + 1)
      case ar: AttributeReference
          if depth < 16 &&
            !facts.unionsIn(scope).exists(_.output.exists(_.exprId == ar.exprId)) =>
        facts.aliases.get(ar.exprId)
          .map(d => resolveDefn(d._1, facts, scope, depth + 1)).getOrElse(ar)
      case other => other
    }

  def collectFacts(plan: LogicalPlan): Facts = {
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

  /** True iff `e` is provably non-NULL for every row `scope` emits.
    * `grouped` is true when `e` sits among a grouped Aggregate's
    * aggregate expressions (its group exists only with ≥ 1 row).
    */
  def nonNull(
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
                ar.nullable == false || // static claim, sound for attrs NOT null-extended by an outer join
                  facts.leafCols.get(ar.exprId).exists(contractNonNull.contains) ||
                  facts.aliases.get(ar.exprId).exists { case (defn, g) =>
                    nonNull(defn, facts, scope, g, depth + 1)
                  }))
        }
      // static fast path (class doc): a nullable=false claim on a
      // non-attribute expression is sound — Spark codegen relies on
      // it — UNLESS the claim was inherited from an attribute instance
      // resolved before an outer join null-extended it (the exact
      // staleness the attr case below routes around): length(staleAttr)
      // carries the stale false, so every referenced attr must be
      // clear of the outer-join facts first (r19 ADVICE, red-proofed
      // in NullOrderingConventionSpec on a hand-built Catalyst plan)
      case e2 if !e2.nullable &&
          e2.references.forall(r => !facts.outerNullable.contains(r.exprId)) => true
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
      // NULL-skipping over its ARGUMENTS, but NULL on a NULL SEPARATOR
      // (first child) — r18 ADVICE soundness fix, red-proofed in
      // NullOrderingConventionSpec
      case c: ConcatWs => rec(c.children.head)
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
      // IsNull/IsNotNull are total; the rest of the predicate algebra
      // is THREE-VALUED (NOT NULL = NULL, NULL AND TRUE = NULL), so
      // NOT/AND/OR and the null-intolerant comparisons need every
      // child proven — r18 ADVICE soundness fix, red-proofed
      case _: IsNull | _: IsNotNull => true
      case b @ (_: Not | _: And | _: Or) => all(b.children)
      case _: EqualNullSafe => true // <=> is total by definition
      case bc: BinaryComparison => all(bc.children)
      case in: In => all(in.children) // NULL list member → NULL on no-match
      case is: InSet => !is.hset.contains(null) && rec(is.child)
      case st: CreateNamedStruct => true // the struct itself (fields carry their own nullability)
      case ca: CreateArray => true
      // size() is non-null when legacySizeOfNull is TRUE (returns -1
      // for NULL input); under the modern default it propagates NULL —
      // r18 ADVICE soundness fix (the pre-r19 branch was inverted)
      case s: Size => s.legacySizeOfNull || rec(s.child)
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
      // (a GLOBAL count needs no case: Count.nullable = false, so the
      // static fast path above proves it — r19, replacing a dead
      // `=> false` branch the fast path obsoleted)
      case rr: RuntimeReplaceable =>
        rr.replacement match {
          case w: With => rec(w.children.head)
          case other => rec(other)
        }
      case _ => false
    }
  }
}

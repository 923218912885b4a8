package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite edit-distance predicates
  * `levenshtein(a, b) <= k` (optionally behind an integral cast) into
  *
  *   abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * Two independent wins for a fuzzy-match join/filter at scale:
  *  - the length guard is O(1) and short-circuits the conjunction, so
  *    wildly different-length candidates never reach the DP at all
  *    (|len(a)-len(b)| > k implies distance > k, so the guard is
  *    semantically redundant — pure pruning);
  *  - the THRESHOLDED Levenshtein (Spark 3.5+) runs the banded
  *    Ukkonen DP — O(k·min(m,n)) cells instead of O(m·n) — and
  *    returns -1 when the distance exceeds k, hence the `>= 0` form.
  *
  * Null semantics are preserved: a null operand makes both the guard
  * and the thresholded comparison null, exactly like the original
  * predicate (conjunction of null with the false branch stays false,
  * with the null/true branches stays null).
  *
  * Idempotent by construction — the rewrite only fires on a
  * Levenshtein WITHOUT a threshold and produces one WITH a threshold,
  * so a fixpoint optimizer batch can re-run it safely. Applied only to
  * Filter and Join conditions (boolean context); projected distance
  * VALUES are untouched.
  */
object FuzzyMatchRewrite extends Rule[LogicalPlan] {

  /** levenshtein(a,b) behind an optional widening integral cast. */
  private object UnthresholdedLev {
    def unapply(e: Expression): Option[Levenshtein] = e match {
      case lev @ Levenshtein(_, _, None) => Some(lev)
      case Cast(lev @ Levenshtein(_, _, None), IntegerType | LongType, _, _) => Some(lev)
      case _ => None
    }
  }

  private object IntK {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(k: Int, IntegerType) => Some(k)
      case Literal(k: Long, LongType) if k <= Int.MaxValue && k >= Int.MinValue => Some(k.toInt)
      case _ => None
    }
  }

  private def rewritten(lev: Levenshtein, k: Int): Expression = {
    val banded = GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k))), Literal(0))
    // The length guard DUPLICATES each operand (once in Length, once in
    // the DP) — legal only for deterministic operands, exactly the gate
    // Catalyst's own duplication rewrites apply: a nondeterministic
    // operand (uuid(), rand()-derived) would be evaluated twice and the
    // guard would test a DIFFERENT string than the DP measures. For
    // those, keep the banded DP alone — single evaluation, still the
    // O(k·min(m,n)) win; only the O(1) short-circuit is forgone.
    if (lev.left.deterministic && lev.right.deterministic) {
      val guard = LessThanOrEqual(
        Abs(Subtract(Length(lev.left), Length(lev.right))), Literal(k))
      And(guard, banded)
    } else banded
  }

  private def rewriteCond(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(UnthresholdedLev(lev), IntK(k)) if k >= 0 => rewritten(lev, k)
    case GreaterThanOrEqual(IntK(k), UnthresholdedLev(lev)) if k >= 0 => rewritten(lev, k)
    case LessThan(UnthresholdedLev(lev), IntK(k)) if k >= 1 => rewritten(lev, k - 1)
    case GreaterThan(IntK(k), UnthresholdedLev(lev)) if k >= 1 => rewritten(lev, k - 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) => f.copy(condition = rewriteCond(cond))
    case j @ Join(_, _, _, Some(cond), _) => j.copy(condition = Some(rewriteCond(cond)))
  }
}

/** Session-level injection for driver-built sessions (mirrors
  * `GraftFunctions.ensureRegistered`'s imperative route; the
  * spark-submit route is `GraftExtensions`).
  */
object GraftRules {
  // synchronized: spark.experimental has no locking, so an unguarded
  // check-then-append from concurrent first uses could lose a write
  // (same guard as AsOfJoin.ensureInjected)
  def ensureInjected(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(FuzzyMatchRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuzzyMatchRewrite
    }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.SortedJaccardGe

/** Domain optimizer rule (SURVEY.md §4.3 stretch surface): for a filter
  * keeping pairs with `sorted_jaccard_ge(a, b, t) IS NOT NULL`, inject
  * the necessary size-ratio conditions
  *
  *   size(a) >= t * size(b)  AND  size(b) >= t * size(a)
  *
  * (jaccard >= t implies t*|B| <= |A∩B| <= min(|A|,|B|)). The extra
  * conjuncts are cheap length comparisons that let Catalyst discard
  * grossly mismatched pairs before the O(|a|+|b|) merge runs — and,
  * because they are ordinary deterministic predicates, the optimizer is
  * free to push or reorder them independently of the fused expression.
  *
  * Row-identity: the guard is implied by the kept predicate, so the
  * filtered set is unchanged (null inputs: size(null) is null, the
  * conjunction is null, and the original IS NOT NULL was already false).
  * The implication only holds when the jaccard predicate is a TOP-LEVEL
  * conjunct — under Or/Not/CaseWhen a row may survive via another
  * branch, so guards are derived from splitConjunctivePredicates only,
  * never from arbitrary subtrees. The rule runs inside the
  * operator-optimization fixed point, so it must be idempotent: each
  * guard is emitted as its own conjunct and only when no semantically
  * equal conjunct is already present — so a re-run adds nothing, and a
  * user's own unrelated `size(x)` predicate does not suppress guarding
  * (the old any-Size check did).
  *
  * At fixture scale the win is subsumed by the expression's own
  * early-exit; the rule exists because a 100 TB operator wants this
  * decision made by the OPTIMIZER (where it composes with pushdown),
  * not hand-inlined into every query.
  */
object JaccardSizePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the predicate may still sit in a Filter, or PushDownPredicate may
    // already have folded it into a join condition — guard both homes
    case Filter(cond, child) if missingGuards(cond).nonEmpty =>
      Filter(missingGuards(cond).foldLeft(cond)(And(_, _)), child)
    case j @ Join(_, _, _, Some(cond), _) if missingGuards(cond).nonEmpty =>
      j.copy(condition = Some(missingGuards(cond).foldLeft(cond)(And(_, _))))
  }

  /** Guards implied by each top-level jaccard conjunct, minus any that
    * are already (semantically) among the conjuncts — per-instance
    * tracking, so only the rule's own prior output suppresses a guard. */
  private def missingGuards(cond: Expression): Seq[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap {
      case IsNotNull(SortedJaccardGe(a, b, Literal(t, DoubleType))) =>
        val td = t.asInstanceOf[Double]
        val sa = Cast(Size(a, legacySizeOfNull = false), DoubleType)
        val sb = Cast(Size(b, legacySizeOfNull = false), DoubleType)
        Seq(
          GreaterThanOrEqual(sa, Multiply(Literal(td), sb)),
          GreaterThanOrEqual(sb, Multiply(Literal(td), sa)))
      case _ => Nil
    }
    guards.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
  }
}

package graft.plans

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

import graft.sync.IncrementalView
import graft.sync.IncrementalView.ViewDef

/** Transparent materialized-view routing: an `Aggregate` whose child is a
  * REGISTERED view source and whose semantics the view's partials can
  * answer is rewritten — at analysis time — to read the O(keyspace) state
  * table instead of the corpus. The user's query does not change; the
  * 100 TB scan does.
  *
  * What qualifies (anything else is left untouched — the rule only ever
  * declines, it never approximates):
  *
  *  - the aggregate's child must be the registered source plan
  *    ([[LogicalPlan.sameResult]] — the same test CacheManager uses to
  *    recognize a cached scan), optionally under ONE Filter whose
  *    predicate touches only key columns (re-rendered against the
  *    state table — the "WHERE region = 'EU'" dashboard slice),
  *  - every grouping expression is a view key column (a SUBSET of the
  *    keys re-aggregates the state: partials merge by addition/min/max,
  *    which is what makes them partials),
  *  - every output is a key column or one of `count(*)`, `sum(measure)`,
  *    `avg(measure)` (decimal measures only — see the splice note at the
  *    Average case), `min(measure)`, `max(measure)` — no DISTINCT, no
  *    FILTER clause, no min/max on a retractable view (it carries none,
  *    structurally).
  *
  * Count rewrites to `coalesce(sum(mv_n), 0)`: a global count over an
  * empty (or fully retracted) view must yield 0, not the null an empty
  * SUM produces. Sums are cast back to the original aggregate's narrower
  * result type in the splice projection, so the rewritten plan is
  * type-identical to the original (the values fit wherever the original
  * sum would have).
  *
  * Freshness is the REGISTRANT'S assertion, exactly as with any
  * materialized view: registering says "serve aggregates of this source
  * from this view"; a view refreshed nightly answers with last night's
  * fold. `spark.graft.view.rewrite=false` turns routing off per session
  * without deregistering.
  *
  * The hook is [[org.apache.spark.sql.SparkSessionExtensions
  * .injectPostHocResolutionRule]], not an optimizer rule: at the end of
  * analysis the aggregate's child is still the un-pruned source shape
  * registration captured — after column pruning it no longer matches
  * `sameResult`. Spark's own view substitution lives in analysis for the
  * same reason.
  */
object ViewRewrite {

  final case class Registered(source: LogicalPlan, root: String, v: ViewDef)

  private val registry = new ConcurrentHashMap[String, Registered]()

  /** Route aggregates over `source` (captured as its analyzed plan) to
    * the view at `root`. One registration per name; re-registering
    * replaces. The caller asserts the view is maintained from exactly
    * this source.
    */
  def register(name: String, source: DataFrame, root: String, v: ViewDef): Unit = {
    val names = source.schema.fieldNames.toSet
    require((v.keys ++ v.measures).forall(names),
      s"view columns ${(v.keys ++ v.measures).filterNot(names).mkString(", ")} " +
        s"missing from the source schema (${names.mkString(", ")})")
    registry.put(name, Registered(source.queryExecution.analyzed, root, v))
  }

  def deregister(name: String): Unit = { registry.remove(name); () }
  def clear(): Unit = registry.clear()

  private[plans] def all: Seq[Registered] = registry.values.asScala.toSeq
}

class ViewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (ViewRewrite.all.isEmpty ||
        !spark.conf.get("spark.graft.view.rewrite", "true").toBoolean) plan
    else plan.transform {
      case agg: Aggregate if agg.resolved && agg.child.resolved =>
        // a routing failure must never break the user's query — the
        // original plan is always a correct answer; decline loudly
        ViewRewrite.all.iterator.map { r =>
          try rewrite(agg, r)
          catch {
            case scala.util.control.NonFatal(e) =>
              logWarning(s"view rewrite declined (root=${r.root}): $e")
              None
          }
        }.collectFirst { case Some(p) => p }.getOrElse(agg)
    }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] =
    xs.foldLeft(Option(Vector.empty[B])) { (acc, a) =>
      acc.flatMap(v => f(a).map(v :+ _))
    }

  private def rewrite(agg: Aggregate, r: ViewRewrite.Registered): Option[LogicalPlan] = {
    // a WHERE between the aggregate and the source routes too, IF it
    // touches only key columns: the state has one row per key, so
    // filtering rows by a key predicate then aggregating equals
    // filtering the state by the same predicate — the dashboard's
    // "WHERE region = 'EU'" served from the view. Any other filter
    // (measure predicates, non-key columns, nondeterminism) declines.
    val (base, keyFilter) = agg.child match {
      case Filter(cond, child) => (child, Some(cond))
      case c                   => (c, None)
    }
    if (!base.sameResult(r.source)) return None
    val nameOf: Map[ExprId, String] =
      base.output.map(a => a.exprId -> a.name).toMap
    val keys = r.v.keys.toSet

    // render the condition against the state table's column names:
    // every reference must be a key, and the expression must be
    // deterministic and aggregate-free. Rendering goes through
    // Expression.sql with attributes swapped to bare names — the state
    // DataFrame re-resolves them in where().
    val stateFilter: Option[Option[Column]] = keyFilter match {
      case None => Some(None)
      case Some(cond) =>
        val routable = cond.deterministic &&
          !cond.exists(_.isInstanceOf[AggregateExpression]) &&
          !cond.exists(_.isInstanceOf[SubqueryExpression]) &&
          cond.references.forall(a => nameOf.get(a.exprId).exists(keys))
        if (!routable) None
        else Some(Some(expr(cond.transform {
          case a: Attribute => UnresolvedAttribute.quoted(nameOf(a.exprId))
        }.sql)))
    }
    if (stateFilter.isEmpty) return None

    def keyName(e: Expression): Option[String] = e match {
      case a: Attribute => nameOf.get(a.exprId).filter(keys)
      case _            => None
    }
    // which registered measure (if any) an aggregate's operand names —
    // a multi-measure view answers aggregates over ANY of its measures
    def measureOf(e: Expression): Option[String] = e match {
      case a: Attribute => nameOf.get(a.exprId).filter(r.v.measures.contains)
      case _            => None
    }
    // avg splices as merged-sum / merged-non-null-count. Bit-parity with
    // the native Average is an operand-type argument: the merged mv_s is
    // cast to Average's own sum type (decimal(p+10, s)) and mv_nm is a
    // LongType count, so the Divide the splice builds has the SAME
    // operand types — hence the same result scale and the same HALF_UP
    // rounding — as the plan it replaces. Only decimal measures route:
    // an integral/double measure's native avg accumulates a running
    // DOUBLE sum (order-dependent), which an exact decimal partial can
    // differ from in the last ulp — the rule declines rather than
    // approximates. A group whose measures were all NULL serves NULL
    // (mv_nm = 0 guards the division), matching Average under ANSI.
    def avgCol(mm: String): Option[Column] =
      r.source.output.find(_.name == mm).map(_.dataType).collect {
        case d: org.apache.spark.sql.types.DecimalType =>
          val sumT = org.apache.spark.sql.types.DecimalType(
            math.min(38, d.precision + 10), d.scale)
          val nm = sum(r.v.stateCol("nm", mm))
          when(nm === 0L, lit(null))
            .otherwise(sum(r.v.stateCol("s", mm)).cast(sumT) / nm)
      }
    def aggCol(ae: AggregateExpression): Option[Column] = {
      if (ae.isDistinct || ae.filter.isDefined) None
      else ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null =>
          Some(coalesce(sum("mv_n"), lit(0L)))
        case s: Sum =>
          measureOf(s.child).map(mm => sum(r.v.stateCol("s", mm)))
        case a: Average => measureOf(a.child).flatMap(avgCol)
        case m: Min if !r.v.retractable =>
          measureOf(m.child).map(mm => min(r.v.stateCol("min", mm)))
        case m: Max if !r.v.retractable =>
          measureOf(m.child).map(mm => max(r.v.stateCol("max", mm)))
        case _ => None
      }
    }

    for {
      groupNames <- traverse(agg.groupingExpressions)(keyName)
      // (selectable, is-aggregate): grouping keys pass through the state
      // groupBy; aggregate calls merge the partials
      picked <- traverse(agg.aggregateExpressions) {
        case a: Attribute          => keyName(a).map(n => (col(n), false))
        case Alias(a: Attribute, _) => keyName(a).map(n => (col(n), false))
        case Alias(ae: AggregateExpression, _) => aggCol(ae).map((_, true))
        case _                     => None
      }
    } yield {
      val state = stateFilter.flatten.foldLeft(
        IncrementalView.read(spark, r.root))(_ where _)
      val aggCols = picked.zipWithIndex.collect {
        case ((c, true), i) => c.as(s"__vr$i")
      }
      val grouped =
        if (aggCols.isEmpty) state.select(groupNames.distinct.map(col): _*).distinct()
        else if (groupNames.isEmpty) state.agg(aggCols.head, aggCols.tail: _*)
        else state.groupBy(groupNames.distinct.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
      // re-project into the original select order, then splice with the
      // original exprIds/types so parents are none the wiser
      val ordered = grouped.select(picked.zipWithIndex.map {
        case ((c, false), _) => c
        case ((_, true), i)  => col(s"__vr$i")
      }: _*)
      val rep = ordered.queryExecution.analyzed
      val splice = agg.output.zip(rep.output).map { case (o, n) =>
        val e: Expression =
          if (n.dataType == o.dataType) n
          else Cast(n, o.dataType, Option(conf.sessionLocalTimeZone))
        Alias(e, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }
      Project(splice, rep)
    }
  }
}

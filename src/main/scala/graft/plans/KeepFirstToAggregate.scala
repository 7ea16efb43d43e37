package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the keep-first-per-key idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .filter($"rn" === 1)
  * }}}
  *
  * into `groupBy(k).agg(min(struct(o…, rest…)))`.
  *
  * Why: the window form sorts every partition by (k, o…) and shuffles ALL
  * rows (WindowGroupLimit trims within sorted runs, but the sort itself
  * remains); the aggregate form gets a map-side partial combine — duplicate
  * keys collapse before the exchange — and any residual sort is on the
  * grouping key alone. At cluster scale, keep-first dedup over a corpus
  * with duplication factor d shuffles 1/d of the data after this rewrite.
  * Spark's struct ordering compares field-by-field, nulls smallest — which
  * is exactly `ASC NULLS FIRST` — so `min` picks the window's first row.
  *
  * Safety conditions (rewrite fires only when ALL hold):
  *  - the Window computes exactly one expression, a `row_number()`;
  *  - the Filter keeps exactly `rn = 1` (or `rn <= 1` / `1 >= rn`);
  *  - every sort order is `ASC NULLS FIRST` on a deterministic expression;
  *  - partition keys are attributes, and there is at least one (a GLOBAL
  *    keep-first on an empty input yields 0 rows from the window form but
  *    1 null row from a global aggregate — so it is left alone);
  *  - every packed type is orderable (no maps).
  *
  * Tie semantics: rows equal on all order expressions are "the same row" to
  * the window's nondeterministic pick; the aggregate resolves such ties by
  * the remaining columns, which is a deterministic refinement of an
  * already-arbitrary choice (and byte-identical when, as in
  * [[graft.pipeline.Clean.KeepFirstTiebreak]], the order totally orders the
  * row). The row_number output itself is constant-folded to literal 1.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`; this
  * rule extends the plan improvement to ad-hoc user queries (including SQL
  * `QUALIFY ROW_NUMBER() ... = 1`-style patterns spelled with a subquery).
  *
  * Interplay with the native [[KeepFirstExec]] — which form wins where:
  * the duplication factor d is the dial. The aggregate form pays a
  * pre-shuffle SortAggregate but shuffles 1/d of the rows (map-side
  * combine); the native node shuffles every row but then pays exactly ONE
  * sort and an O(1)-state streaming pass. For the dedup norm (d ≲ 2) the
  * native node wins; for heavily-duplicated corpora the aggregate wins.
  * Hence the split: the library entry point `Clean.dedupKeepFirst` emits
  * the NATIVE node (its callers are keyed-upsert dedups where d is small),
  * `Clean.dedupKeepFirstAgg` is the explicit large-d variant, and THIS
  * rule rewrites ad-hoc window idioms — where d is unknown — to the
  * aggregate form, which is safe at any d and strictly better than the
  * window it replaces. The rule never touches `KeepFirstNode` plans.
  * PlansSpec's regime-dial case pins the 1/d shuffle collapse at d=50.
  */
object KeepFirstToAggregate extends Rule[LogicalPlan] {

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v == 1
    case _ => false
  }

  private def keepsFirstOnly(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, l) => a.semanticEquals(rn) && isOne(l)
    case EqualTo(l, a: Attribute) => a.semanticEquals(rn) && isOne(l)
    case LessThanOrEqual(a: Attribute, l) => a.semanticEquals(rn) && isOne(l)
    case GreaterThanOrEqual(l, a: Attribute) => a.semanticEquals(rn) && isOne(l)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _))
        if keepsFirstOnly(cond, alias.toAttribute) &&
          part.nonEmpty && part.forall(_.isInstanceOf[Attribute]) &&
          order.nonEmpty &&
          order.forall(s => s.direction == Ascending &&
            s.nullOrdering == NullsFirst && s.child.deterministic) &&
          orderable(order.map(_.child) ++ child.output) =>
      rewrite(part.map(_.asInstanceOf[Attribute]), order,
        alias.toAttribute, child)
  }

  private def orderable(es: Seq[Expression]): Boolean =
    es.forall(e => RowOrdering.isOrderable(e.dataType))

  private def rewrite(part: Seq[Attribute], orderSpec: Seq[SortOrder],
      rn: Attribute, rawChild: LogicalPlan): LogicalPlan = {
    val order = orderSpec.map(_.child)
    // InferWindowGroupLimit may already have slid a per-key top-1 limiter
    // under the Window; it would force the very sort this rewrite removes,
    // and min-over-top-1-by-the-same-order ≡ min-over-all, so unwrap it.
    // Compare FULL SortOrders (direction + null ordering, not just the
    // children) — a limiter trimming by a different direction keeps a
    // different row set and must stay.
    val child = rawChild match {
      case WindowGroupLimit(p, o, _, limit, grandchild)
          if limit >= 1 &&
            p.map(_.canonicalized) == part.map(_.canonicalized) &&
            o.map(so => (so.child.canonicalized, so.direction, so.nullOrdering)) ==
              orderSpec.map(so => (so.child.canonicalized, so.direction, so.nullOrdering)) =>
        grandchild
      case other => other
    }
    val partIds = part.map(_.exprId).toSet
    val carried = child.output.filterNot(a => partIds.contains(a.exprId))
    // Comparison order: explicit sort expressions first, then every
    // non-grouping column as the deterministic tiebreak. Field names are
    // positional — output names may repeat, struct fields must not.
    val packedFields = order ++ carried
    val packed = CreateNamedStruct(packedFields.zipWithIndex.flatMap {
      case (e, i) => Seq(Literal(s"_$i"), e)
    })
    val minAlias = Alias(
      AggregateExpression(Min(packed), Complete, isDistinct = false),
      "__keep_first")()
    val agg = Aggregate(part, part :+ minAlias, child)
    val minRef = minAlias.toAttribute
    // Rebuild the Filter's output (child columns + rn) under the ORIGINAL
    // exprIds so downstream references stay bound; rn is 1 by construction.
    val carriedIndex = carried.zipWithIndex.map {
      case (a, i) => a.exprId -> (order.length + i)
    }.toMap
    val projList: Seq[NamedExpression] = child.output.map { a =>
      if (partIds.contains(a.exprId)) a
      else {
        val i = carriedIndex(a.exprId)
        Alias(GetStructField(minRef, i, Some(s"_$i")), a.name)(exprId = a.exprId)
      }
    } :+ Alias(Literal(1), rn.name)(exprId = rn.exprId)
    Project(projList, agg)
  }
}

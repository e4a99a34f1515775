package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.functions.TopKByScore

/** Optimizer rule: rewrite the window top-k antipattern
  *
  * {{{
  *   SELECT p..., rn, id FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY s DESC, id ASC) rn
  *     FROM t) WHERE rn <= k
  * }}}
  *
  * into a bounded top-k aggregate + posexplode. The window form shuffles
  * EVERY scored row to its group's reducer before discarding all but k;
  * the aggregate form (graft.functions.TopKByScore) combines map-side, so
  * the shuffle carries at most k rows per (partition, group) — the
  * difference between moving a 100 TB score matrix and moving kilobytes.
  *
  * Conservative by design — it only fires when the rewrite is provably
  * semantics-preserving:
  *  - single row_number window expression, ORDER BY (s DESC, id ASC);
  *  - s is numeric and non-nullable (TopKByScore drops null scores, a
  *    window ranks them), id is an integral non-nullable attribute;
  *  - the filter is rn <= k / rn < k / rn = 1 with a literal k;
  *  - the projection references only partition columns, rn, and id (in
  *    particular NOT s: the aggregate does not output scores).
  * Anything else is left untouched.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window)) =>
      tryRewrite(projList, cond, w).getOrElse(p)
  }

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def tryRewrite(
      projList: Seq[NamedExpression],
      cond: Expression,
      w: Window): Option[LogicalPlan] = w match {
    case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)), partitionSpec, orderSpec, child, _)
        if spec.partitionSpec == partitionSpec && spec.orderSpec == orderSpec =>
      val rnAttr = alias.toAttribute
      orderSpec match {
        case Seq(SortOrder(score, Descending, NullsLast, _), SortOrder(idAttr: Attribute, Ascending, NullsFirst, _))
            if score.deterministic && !score.nullable &&
               score.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
               !idAttr.nullable &&
               (idAttr.dataType == LongType || idAttr.dataType == IntegerType) &&
               partitionSpec.forall(_.isInstanceOf[Attribute]) =>
          val partAttrs = partitionSpec.map(_.asInstanceOf[Attribute])
          val allowed = AttributeSet(partAttrs :+ rnAttr :+ idAttr)
          val k = limitOf(cond, rnAttr)
          if (k.isEmpty || k.get <= 0 ||
              !projList.forall(_.references.subsetOf(allowed))) return None

          // Aggregate: group by partition cols, bounded top-k of ids
          val topk = TopKByScore(
            Cast(score, DoubleType),
            if (idAttr.dataType == LongType) idAttr else Cast(idAttr, LongType),
            k.get)
          val idsAlias = Alias(
            AggregateExpression(topk, Complete, isDistinct = false), "_graft_topk_ids")()
          val agg = Aggregate(partAttrs, partAttrs :+ idsAlias, child)

          // posexplode the id array
          val posAttr = AttributeReference("_graft_pos", IntegerType, nullable = false)()
          val outIdAttr = AttributeReference("_graft_id", LongType, nullable = false)()
          val gen = Generate(
            PosExplode(idsAlias.toAttribute),
            unrequiredChildIndex = Seq(agg.output.size - 1),
            outer = false, qualifier = None,
            generatorOutput = Seq(posAttr, outIdAttr), agg)

          // substitute rn -> pos + 1 and id -> generated id, preserving
          // the original output names and exprIds
          val rnExpr = Add(posAttr, Literal(1))
          val idExpr: Expression =
            if (idAttr.dataType == LongType) outIdAttr else Cast(outIdAttr, idAttr.dataType)
          val newProj = projList.map { ne =>
            val substituted = ne.transform {
              case a: Attribute if a.semanticEquals(rnAttr) => rnExpr
              case a: Attribute if a.semanticEquals(idAttr) => idExpr
            }
            substituted match {
              case a: Alias => a
              case a: Attribute => a
              case e => Alias(e, ne.name)(exprId = ne.exprId)
            }
          }
          Some(Project(newProj, gen))
        case _ => None
      }
    case _ => None
  }
}

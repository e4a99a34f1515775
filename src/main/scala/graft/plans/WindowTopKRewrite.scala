package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.TopKRowsByScore

/** Optimizer rule: rewrite the window top-k antipattern
  *
  * {{{
  *   SELECT cols... FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY s DESC, id) rn
  *     FROM t) WHERE rn <= k
  * }}}
  *
  * into a bounded top-k aggregate + posexplode. The window form shuffles
  * EVERY scored row to its group's reducer before discarding all but k;
  * the aggregate form (graft.functions.TopKRowsByScore) combines
  * map-side, so the shuffle carries at most k rows per (partition,
  * group) — the difference between moving a 100 TB table and moving k
  * rows per group. Projected columns beyond the partition keys ride
  * along in the aggregate's payload struct, so arbitrary projections
  * (latest-per-key with full rows, top-k with scores) are covered.
  *
  * Conservative by design — it only fires when the rewrite is provably
  * semantics-preserving:
  *  - single row_number window expression, ORDER BY (s DESC, id ASC|DESC);
  *  - s is deterministic, non-nullable (TopKRowsByScore drops null
  *    scores, a window ranks them), and of a type totally-ordered and
  *    EXACTLY representable in double — Float/Double/Int/Short/Byte, or
  *    Timestamp via epoch microseconds (|micros| < 2^53 until year
  *    ~2255). Long/Decimal scores are excluded: beyond 2^53 distinct
  *    values collapse under a double cast and could rank differently;
  *  - id is a deterministic non-nullable integral expression (the
  *    tiebreak total-orders each group, making row_number deterministic);
  *  - the filter is rn <= k / rn < k / rn = 1 with a literal k.
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

  /** Score expression as an exact double, or None if the type does not
    * embed exactly in double's 2^53 integer range. */
  private def scoreAsDouble(score: Expression): Option[Expression] = score.dataType match {
    case FloatType | DoubleType | IntegerType | ShortType | ByteType =>
      Some(Cast(score, DoubleType))
    case TimestampType =>
      Some(Cast(UnixMicros(score), DoubleType))
    case _ => None // LongType/DecimalType collapse beyond 2^53; non-numeric unsupported
  }

  private def tryRewrite(
      projList: Seq[NamedExpression],
      cond: Expression,
      w: Window): Option[LogicalPlan] = w match {
    case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)), partitionSpec, orderSpec, child, _)
        if spec.partitionSpec == partitionSpec && spec.orderSpec == orderSpec =>
      val rnAttr = alias.toAttribute
      orderSpec match {
        case Seq(SortOrder(score, Descending, _, _), SortOrder(idExpr, idDir, _, _))
            if score.deterministic && !score.nullable &&
               idExpr.deterministic && !idExpr.nullable &&
               (idExpr.dataType == LongType || idExpr.dataType == IntegerType) &&
               partitionSpec.forall(_.isInstanceOf[Attribute]) =>
          val partAttrs = partitionSpec.map(_.asInstanceOf[Attribute])
          val k = limitOf(cond, rnAttr)
          val scoreD = scoreAsDouble(score)
          if (k.isEmpty || k.get <= 0 || scoreD.isEmpty) return None

          // Columns the projection needs beyond group keys and rn ride in
          // the payload struct (ordered as in child.output).
          val partSet = AttributeSet(partAttrs)
          val needed = AttributeSet(projList.flatMap(_.references)) -- partSet - rnAttr
          if (!needed.subsetOf(child.outputSet)) return None
          val payloadAttrs = child.output.filter(needed.contains)
          if (payloadAttrs.isEmpty) return None // pure part+rn projections: not worth a struct

          val idL =
            if (idExpr.dataType == LongType) idExpr else Cast(idExpr, LongType)
          val topk = TopKRowsByScore(scoreD.get, idL, CreateStruct(payloadAttrs),
            k.get, idAsc = idDir == Ascending)
          val topkAlias = Alias(
            AggregateExpression(topk, Complete, isDistinct = false), "_graft_topk")()
          val agg = Aggregate(partAttrs, partAttrs :+ topkAlias, child)

          // posexplode the payload array
          val posAttr = AttributeReference("_graft_pos", IntegerType, nullable = false)()
          val rowAttr = AttributeReference("_graft_row", topk.payload.dataType, nullable = false)()
          val gen = Generate(
            PosExplode(topkAlias.toAttribute),
            unrequiredChildIndex = Seq(agg.output.size - 1),
            outer = false, qualifier = None,
            generatorOutput = Seq(posAttr, rowAttr), agg)

          // substitute rn -> pos + 1 and payload attrs -> struct fields,
          // preserving original output names and exprIds
          val fieldOf = payloadAttrs.zipWithIndex.map { case (a, i) =>
            a.exprId -> GetStructField(rowAttr, i, Some(a.name))
          }.toMap
          val newProj = projList.map { ne =>
            val substituted = ne.transform {
              case a: Attribute if a.semanticEquals(rnAttr) => Add(posAttr, Literal(1))
              case a: Attribute if fieldOf.contains(a.exprId) => fieldOf(a.exprId)
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

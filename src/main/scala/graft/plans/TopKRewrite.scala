package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.TopKRows

/** Optimizer rule: rewrite the window top-k idiom
  *
  *   `withColumn("rank", row_number().over(partitionBy(g).orderBy(...)))
  *      .where($"rank" <= k)`
  *
  * into the bounded-heap aggregate ([[graft.functions.TopKRows]]) — the
  * window formulation SORTS every group member through the shuffle; the
  * rewrite moves at most k rows per (group, task). Output is identical up
  * to `row_number`'s nondeterministic tie selection: when orderSpec keys
  * tie, the window keeps a partitioning-dependent arbitrary subset while
  * the heap selects deterministically by payload struct order — exact
  * identity holds when the orderSpec is a total order (the AnalyticsSpec /
  * TopKRewriteSpec pins), and under ties the heap's pick is the MORE
  * deterministic of the two. Downstream references keep resolving because the
  * replacement re-aliases every reconstructed column to the ORIGINAL
  * attribute ids.
  *
  * OPT-IN (`spark.graft.rewrite.topk=true`, default off) and deliberately
  * narrow — it fires only when the semantics provably carry over:
  *  - exactly one window expression, a `row_number()` with the default
  *    running frame, compared `<=`/`<` against a positive int literal;
  *  - every DESCENDING sort key: any orderable type (the heap's
  *    "largest first" IS descending order, nulls-last falls out — no
  *    transform needed);
  *  - every ASCENDING sort key: a NON-NULLABLE integral column, inverted
  *    with bitwise-not (`~x = -x-1`: total and strictly monotone
  *    decreasing, unlike negation which overflows at MinValue). Nullable
  *    or non-integral ascending keys leave the plan untouched — asc
  *    nulls-first cannot be expressed by inverting values;
  *  - `k <= spark.graft.rewrite.topk.maxK` (default 1000): a huge k must
  *    keep the window's SPILLABLE sort instead of becoming a per-task
  *    in-memory heap;
  *  - every CHILD OUTPUT column orderable: the payload rides inside the
  *    heap's sort-key struct, so a map-typed passenger column — legal
  *    under the window — would crash the heap at execution.
  *
  * Anything else — other window functions alongside, rank referenced
  * beyond the filter, non-literal k — does not match, and the plan is
  * left exactly as written.
  */
case class TopKRewrite() extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rewrite.topk", "false").toBoolean

  /** Largest k the rewrite touches (`spark.graft.rewrite.topk.maxK`). */
  private def maxK: Int =
    conf.getConfString("spark.graft.rewrite.topk.maxK", "1000").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        tryRewrite(f, cond, w, passthrough = Nil).getOrElse(f)
      case f @ Filter(cond, p @ Project(projectList, w: Window))
          if projectList.forall(_.isInstanceOf[AttributeReference]) &&
            p.outputSet.subsetOf(w.outputSet) =>
        tryRewrite(f, cond, w, passthrough = p.output).getOrElse(f)
    }

  /** The filtered rank attribute and the literal k, for `rank <= k` /
    * `rank < k` shapes. */
  private def rankBound(cond: Expression): Option[(Attribute, Int)] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k - 1))
      case _ => None
    }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Heap sort-key for one window SortOrder, or None when inexpressible.
    * The heap keeps the k LARGEST under natural struct order and emits
    * them descending; rank 1 must be the sort order's FIRST row, so a
    * DESC key passes through raw and an ASC key is inverted. */
  private def heapKey(so: SortOrder): Option[Expression] = so match {
    case SortOrder(e, Descending, NullsLast, _) => Some(e)
    case SortOrder(e, Ascending, NullsFirst, _)
        if isIntegral(e.dataType) && !e.nullable =>
      Some(BitwiseNot(e))
    case _ => None
  }

  private def tryRewrite(f: Filter, cond: Expression, w: Window,
                         passthrough: Seq[Attribute]): Option[LogicalPlan] = {
    for {
      (rankAttr, k) <- rankBound(cond)
      if k > 0
      // exactly one window expression: row_number over the default frame
      rankAlias <- w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(
              RowFrame, UnboundedPreceding, CurrentRow))), _)) => Some(a)
        case _ => None
      }
      if rankAlias.exprId == rankAttr.exprId
      // grouping keys must be plain attributes (they become agg keys AND
      // must be reconstructable per emitted row)
      groupAttrs <- Some(w.partitionSpec).collect {
        case ps if ps.forall(_.isInstanceOf[AttributeReference]) =>
          ps.map(_.asInstanceOf[AttributeReference])
      }
      // the rewrite is a win for SMALL k only: the heap buffers k row
      // copies per (group, task) in memory and serializes whole buffers
      // between partial and final — a huge k must keep the window's
      // spillable sort
      if k <= maxK
      keys <- traverse(w.orderSpec.map(heapKey))
      payload = CreateStruct(w.child.output)
      sortKey = CreateStruct(keys :+ payload)
      // the PAYLOAD rides inside the heap's sort-key struct, so every
      // child column must be orderable — the window only needed the sort
      // KEYS orderable, and a map-typed passenger column would crash the
      // heap at execution (checkInputDataTypes ran at analysis, before
      // this rule inserts the expression)
      if RowOrdering.isOrderable(sortKey.dataType)
    } yield {
      val topAlias = Alias(AggregateExpression(
        TopKRows(sortKey, k), Complete, isDistinct = false), "_top")()
      val agg = Aggregate(groupAttrs, groupAttrs :+ topAlias, w.child)

      val elemType = sortKey.dataType.asInstanceOf[StructType]
      val posAttr = AttributeReference("_pos", IntegerType, nullable = false)()
      val rowAttr = AttributeReference("_row", elemType, nullable = false)()
      val gen = Generate(PosExplode(topAlias.toAttribute),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(posAttr, rowAttr), agg)

      // rebuild EVERY original output under its ORIGINAL exprId
      val payloadField = GetStructField(rowAttr, keys.length)
      val childCols = w.child.output.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(payloadField, i), a.name)(exprId = a.exprId)
      }
      val rankCol = Alias(
        Add(posAttr, Literal(1)), rankAlias.name)(exprId = rankAlias.exprId)
      val rebuilt = childCols :+ rankCol
      val byId = rebuilt.map(a => a.exprId -> a).toMap
      val outputOrder =
        if (passthrough.nonEmpty) passthrough else f.output
      Project(outputOrder.map(a => byId(a.exprId)), gen)
    }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}

package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, JoinedRow, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Full custom-operator stack (SURVEY.md §7.3 extension point (c)):
  *
  *   logical node  → `TopKPerGroup`
  *   rewrite rule  → `RewriteWindowTopK` (optimizer): recognizes the
  *                   canonical `row_number() OVER (PARTITION BY g ORDER
  *                   BY o) <= k` idiom (the q18 shape) and swaps in the
  *                   custom node — user code keeps the declarative form
  *   strategy      → `TopKStrategy` plans it physically
  *   physical exec → `TopKPerGroupExec`: bounded k-row heap per group
  *
  * Why: the window formulation sorts EVERY row of every group
  * (O(n log n) per partition, all rows through the shuffle and sort).
  * The heap exec does O(n log k) with at most k rows retained per group
  * — at 100 TB with million-row groups and k=3 that is the difference
  * between a full sort and a near-scan. Registered via
  * `graft.plans.GraftExtensions` (or `spark.experimental`); disable per
  * session with `spark.graft.topkRewrite=false`. Results match the
  * native path exactly when the window order is total (as all graft
  * queries are); for tied orderings BOTH paths pick ties
  * implementation-dependently. Memory envelope: groups-per-partition ×
  * k rows on-heap (no spill) — the kill switch exists for pathological
  * group cardinalities.
  *
  * Honest positioning: since 3.5 Spark's own `InsertWindowGroupLimit`
  * already bounds this idiom to k rows per partition before the shuffle
  * (partial/final `WindowGroupLimitExec`), which captures most of the
  * at-scale win; that native path still sorts each partition, which the
  * heap avoids. This stack is therefore part optimization, part the
  * worked exemplar of the rule+strategy+exec extension point.
  */
case class TopKPerGroup(groupExprs: Seq[Expression],
                        orderSpec: Seq[SortOrder], k: Int,
                        rnAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  // rnAttr is minted here, not read from the child — without this the
  // plan is flagged invalid (missingInput) and never reaches planning
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions
    .AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

/** Optimizer rule: Filter(rn <= k, [Project], Window(row_number ...))
  * → [Project](TopKPerGroup(...)). Conservative — bails on any shape it
  * does not fully recognize.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** Kill switch: the rewrite trades the native spillable sort for an
    * in-memory (groups-per-partition × k)-row heap — disable for
    * pathological group cardinalities. */
  val EnabledConf = "spark.graft.topkRewrite"

  private def semanticEq(a: Seq[Expression], b: Seq[Expression]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      x.semanticEquals(y)
    }

  private def asTopK(cond: Expression, plan: LogicalPlan)
      : Option[LogicalPlan] = plan match {
    case w @ Window(Seq(a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(part, order, _)), _)), _, _, child, _)
        if part.nonEmpty => // empty PARTITION BY → ClusteredDistribution
                            // would be invalid; leave global top-k native
      val rn = a.toAttribute
      // strip optimizer-inferred IsNotNull(rn) conjuncts, then expect a
      // single bound on rn
      val conjuncts = cond match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          Seq(l, r)
        case c => Seq(c)
      }
      val bounds = conjuncts.filterNot {
        case org.apache.spark.sql.catalyst.expressions
          .IsNotNull(r: Attribute) => r.semanticEquals(rn)
        case _ => false
      }
      // Long arithmetic: `rn < Int.MinValue` must stay empty, not wrap
      val kOpt: Option[Long] = bounds match {
        case Seq(LessThanOrEqual(r: Attribute, Literal(k: Int, _)))
          if r.semanticEquals(rn) => Some(k.toLong)
        case Seq(LessThan(r: Attribute, Literal(k: Int, _)))
          if r.semanticEquals(rn) => Some(k.toLong - 1)
        case _ => None
      }
      // if Spark's own InsertWindowGroupLimit already ran (it does when
      // this rule is registered late via spark.experimental), its node
      // below the Window is redundant once we take over — strip it
      val cleanChild = child match {
        case org.apache.spark.sql.catalyst.plans.logical
          .WindowGroupLimit(p2, o2, _, _, gc)
          if semanticEq(p2, part) && semanticEq(o2, order) => gc
        case other => other
      }
      kOpt.filter(k => k > 0 && k <= Int.MaxValue).map(k =>
        TopKPerGroup(part, order, k.toInt, rn.withNullability(false),
          cleanChild))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan.transform {
      case f @ Filter(cond, w: Window) =>
        asTopK(cond, w).getOrElse(f)
      case f @ Filter(cond, p @ Project(projectList, w: Window))
          if projectList.forall(_.isInstanceOf[Attribute]) =>
        asTopK(cond, w)
          .map(topk => Project(projectList, topk))
          .getOrElse(f)
    }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, orderSpec, k, rnAttr, child) =>
      TopKPerGroupExec(groupExprs, orderSpec, k, rnAttr,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
                            orderSpec: Seq[SortOrder], k: Int,
                            rnAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions
    .AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr :: Nil)

  // one shuffle clustered on the group keys; no sort requirement — the
  // heap does the bounded ordering work
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsLocal = groupExprs
    val orderSpecLocal = orderSpec
    val kLocal = k
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderSpecLocal, childOutput)
      // worst-on-top heap per group, capped at k rows
      val heaps = mutable.LinkedHashMap
        .empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        // look up with the reused projection buffer; copy the key only
        // on first insert (getOrElseUpdate would copy on every row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val out = UnsafeProjection.create(
        (childOutput :+ rnAttr).map(a => a: Expression),
        childOutput :+ rnAttr)
      val joined = new JoinedRow
      val rnRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      heaps.iterator.flatMap { case (_, heap) =>
        // strict Seq.map + shared projection buffer would alias rows —
        // copy each k-bounded output row
        heap.dequeueAll.sorted(ordering).zipWithIndex.map {
          case (row, i) =>
            rnRow.update(0, i + 1)
            out(joined(row, rnRow)).copy()
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

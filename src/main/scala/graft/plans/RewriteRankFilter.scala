package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the canonical top-k-per-key SQL pattern
  *
  *   Project(cols, Filter(rn <= k, Window(row_number() over
  *     (partition by keys order by ord) as rn, child)))
  *
  * — where the projection drops the rank column — into the heap-based
  * TopKPerKeyNode, eliminating the full per-partition sort and the
  * full-data shuffle that the Window operator needs. All three SQL rank
  * families map onto the node's retention modes: `row_number()` →
  * exact-k heap, `rank()` → k-plus-boundary-ties ordered groups,
  * `dense_rank()` → all rows of the k smallest distinct sort values.
  *
  * Safety: only fires when (a) the single window function is
  * row_number(), rank() or dense_rank() with the default running frame,
  * (b) the filter bounds it by a literal, and (c) the projection uses
  * child columns only (the rank value itself is discarded). Tie
  * behavior matches the function it replaces: row_number picks an
  * arbitrary order-equal subset (deterministic only if the ordering is
  * total), rank/dense_rank keep all ties (always deterministic).
  *
  * Registered through `spark.experimental.extraOptimizations` (with the
  * matching planner strategy) by [[TopK.install]].
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rnId: ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId => Some(v)
      case LessThan(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId => Some(v - 1)
      case GreaterThanOrEqual(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId => Some(v)
      case GreaterThan(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId => Some(v - 1)
      case _ => None
    }

  /** None = not rewritable; Some(mode) = the retention contract of the
    * matched rank family (Rank and DenseRank are sibling case classes,
    * not subtypes, so the matches are exact).
    */
  private def modeOf(fn: Expression): Option[TopKMode] = fn match {
    case _: RowNumber => Some(TopKMode.ExactK)
    case _: Rank => Some(TopKMode.KPlusTies)
    case _: DenseRank => Some(TopKMode.KDistinct)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(al @ Alias(we: WindowExpression, _)),
          partitionSpec, orderSpec, child, _)))
        if modeOf(we.windowFunction).isDefined &&
          (we.windowSpec.frameSpecification match {
            case SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              CurrentRow) => true
            case _ => false
          }) &&
          orderSpec.nonEmpty &&
          limitOf(cond, al.exprId).exists(_ >= 1) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      val k = limitOf(cond, al.exprId).get
      val mode = modeOf(we.windowFunction).get
      // Spark's own InferWindowGroupLimit may already have wrapped the
      // child in a sort-based WindowGroupLimit; the heap operator
      // subsumes it (ties/distinct retention included), so strip it
      // (it would force two useless sorts).
      val cleanChild = child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      Project(projectList,
        TopKPerKeyNode(partitionSpec, orderSpec, k, cleanChild, mode))
  }
}

/** Installer for the rule + strategy pair on a live session. */
object TopKRewrite {
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
    if (!exp.extraOptimizations.contains(RewriteRankFilterToTopK))
      exp.extraOptimizations = exp.extraOptimizations :+
        RewriteRankFilterToTopK
  }
}

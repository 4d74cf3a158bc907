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
  * full-data shuffle that the Window operator needs.
  *
  * Safety: only fires when (a) the single window function is
  * row_number() with the default running frame, (b) the filter bounds it
  * by a literal, and (c) the projection uses child columns only (the
  * rank value itself is discarded). Tie behavior is identical to
  * row_number's: among order-equal rows both pick an arbitrary subset,
  * deterministic only if the ordering is total — same contract as the
  * SQL it replaces.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(al @ Alias(we: WindowExpression, _)),
          partitionSpec, orderSpec, child, _)))
        if we.windowFunction.isInstanceOf[RowNumber] &&
          (we.windowSpec.frameSpecification match {
            case SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              CurrentRow) => true
            case _ => false
          }) &&
          orderSpec.nonEmpty &&
          limitOf(cond, al.exprId).exists(_ >= 1) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      val k = limitOf(cond, al.exprId).get
      // Spark's own InferWindowGroupLimit may already have wrapped the
      // child in a sort-based WindowGroupLimit; the heap operator
      // subsumes it, so strip it (it would force two useless sorts).
      val cleanChild = child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      Project(projectList,
        TopKPerKeyNode(partitionSpec, orderSpec, k, cleanChild))
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

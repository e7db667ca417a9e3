package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule — the `Rule[LogicalPlan]` leg of the §7.3(c) extension
 * trio: rewrites the ubiquitous per-group top-k idiom
 *
 *   df.withColumn("rn", row_number().over(partitionBy(keys).orderBy(ord)))
 *     .filter($"rn" <= k).drop("rn")
 *
 * into [[TopKPerKeyPlan]], which plans as the partial/final bounded-heap
 * pair instead of a full shuffle + per-partition sort of every row. Fires
 * only when the rewrite is provably equivalent:
 *  - the window computes exactly one expression, a `row_number()` over the
 *    standard UNBOUNDED PRECEDING..CURRENT ROW row frame with a non-empty
 *    ORDER BY;
 *  - the filter keeps a prefix (`rn <= k`, `rn < k`, or `rn = 1`) and
 *    nothing else;
 *  - the projection above drops the row-number column (the operator does
 *    not produce it).
 *
 * Registered by `graft.GraftExtensions` via `injectOptimizerRule`; opt out
 * per session with `spark.graft.topkRewrite.enabled=false`. The
 * row_number ordering must be total per key for the original query to be
 * deterministic; under that same precondition the heap result is the same
 * row set.
 *
 * Memory model: the heap pass holds k copied rows per distinct key per
 * partition (map-side) / per key (reduce-side) with no spill — the same
 * in-memory footprint class as a hash aggregation of `collect k per key`,
 * smaller than the window's full-partition sort buffer whenever rows-per-
 * key ≫ k, but without WindowExec's spill-to-disk path. For extreme
 * key-cardinality-per-partition workloads, disable the rewrite.
 */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** k such that keeping rows with rowNum `cond`-true equals "first k". */
  private def prefixK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) && k > 0 =>
      Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) && k > 1 =>
      Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) && k > 0 =>
      Some(k)
    case _ => None
  }

  private val standardRowFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.topkRewrite.enabled", "true").toBoolean)
      return plan
    rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(),
            WindowSpecDefinition(ps, os, frame)), _)), _, _, child, _)))
        if os.nonEmpty && frame == standardRowFrame =>
      val rn = alias.toAttribute
      prefixK(cond, rn) match {
        case Some(k)
            if !projectList.exists(_.references.contains(rn)) &&
              projectList.forall(_.deterministic) =>
          Project(projectList, TopKPerKeyPlan(ps, os, k, child))
        case _ => p
      }
  }
}

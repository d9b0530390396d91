package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites the ubiquitous per-key top-k idiom
  *
  * {{{ Filter(rank <= k, Window([row_number() AS rank], keys, order)) }}}
  *
  * into [[TopKPerKeyNode]], so the planner's bounded-heap strategy
  * replaces Window's full per-group sort without the query changing.
  * Fires only on the exact conservative shape where the swap is
  * equivalence-preserving:
  *
  *  - a single window expression that is a plain `row_number()`;
  *  - non-empty partition keys (global top-k already has
  *    TakeOrderedAndProject) and a non-empty ordering (an unordered
  *    row_number is nondeterministic under either operator, but the
  *    two operators would realize different arbitrary orders);
  *  - the filter is exactly `rank <= lit` / `rank < lit` on the
  *    window output;
  *  - `k` is at most `spark.graft.topk.maxK` (default 10000).
  *    [[TopKPerKeyExec]] holds one size-k heap per distinct key per
  *    partition on-heap with no spill path, so its memory bound is
  *    O(keys-per-partition × k) rows; Window's sort spills. For a
  *    large literal k the window form is the safe plan, so the
  *    rewrite declines rather than trade a completed spilling sort
  *    for a possible OOM.
  *
  * Runs in the user-provided optimizer batch (after the main batches
  * have collapsed pass-through projections, which is what exposes the
  * Filter-over-Window shape). The row_number ranks are deterministic
  * iff the ordering is total per key — the same contract the window
  * form already has. */
object TopKRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _))
          if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
        val rank = alias.toAttribute
        // k as Long: `rank < Int.MinValue` would otherwise wrap to
        // Int.MaxValue via `v - 1` and turn an always-false filter
        // into return-everything
        val k: Option[Long] = cond match {
          case LessThanOrEqual(a: AttributeReference, IntegerLiteral(v))
              if a.semanticEquals(rank) => Some(v.toLong)
          case LessThan(a: AttributeReference, IntegerLiteral(v))
              if a.semanticEquals(rank) => Some(v.toLong - 1L)
          case _ => None
        }
        val maxKRaw = conf.getConfString("spark.graft.topk.maxK", "10000")
        val maxK = try maxKRaw.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.topk.maxK must be a number, got '$maxKRaw'")
        }
        k.filter(kk => kk >= 1L && kk <= maxK).map { kk =>
          TopKPerKeyNode(w.partitionSpec, w.orderSpec, kk.toInt,
            rank.asInstanceOf[AttributeReference], w.child)
        }
      case _ => None
    }
}

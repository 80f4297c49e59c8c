/* org.apache.spark.sql placement: the rule pattern-matches engine
 * expressions and Catalyst internals — same placement rationale as
 * EnvelopeExpressions.scala. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Coalesce, Expression, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites `size(array_intersect(a, b))` to the native
  * [[SortedIntersectCount]] sorted-merge when BOTH inputs are provably
  * ascending-distinct — i.e. produced by [[ShingleHashes]], whose output
  * is sorted, deduplicated, and null-free by construction.
  *
  * The naive formulation is what a SQL user writes for shingle-overlap
  * checks; it materializes the intersection array (allocation + hash
  * structure) per row just to take its length. The sorted-merge needs no
  * allocation and exits early — on near-dup verify paths this runs once
  * per candidate pair. The rewrite is conservative by design: an
  * attribute fed from a shuffle or an arbitrary array expression is NOT
  * provably sorted and keeps the generic path (sortedness is a semantic
  * precondition of the merge, not a checked one).
  *
  * Result compatibility: both sides return IntegerType; `array_intersect`
  * deduplicates its output, which equals the merge count on distinct
  * inputs; null arrays propagate null under the default (non-legacy)
  * `size` semantics. Lenient sessions (`ansi.enabled=false` with the
  * legacy `size(null) = -1` default) still get the rewrite, wrapped in
  * `coalesce(count, -1)` — a null count arises exactly when `size` would
  * have seen a null intersection array.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def provablySorted(e: Expression): Boolean = e match {
    case _: ShingleHashes => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), legacy)
          if provablySorted(a) && provablySorted(b) =>
        val cnt = SortedIntersectCount(a, b)
        if (legacy) Coalesce(Seq(cnt, Literal(-1))) else cnt
    }
}

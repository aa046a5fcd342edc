package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a symmetric band range join
  * `a >= b - c1 && a <= b + c2` (a from one side, b from the other,
  * c1/c2 literals) into an EQUI join on interval buckets of width
  * W = c1 + c2, with the original predicate re-applied exactly:
  *
  *  - probe side gains `floor(a / W)` as its bucket key;
  *  - build side explodes to `sequence(floor((b-c1)/W), floor((b+c2)/W))`
  *    — at most 2 buckets per row, since the interval length equals W;
  *  - the join becomes `bucket = bucket AND <original condition>`.
  *
  * Soundness: division by a positive W and `floor` are monotone in
  * IEEE arithmetic, so `a ∈ [lo, hi]` implies `floor(a/W)` lies in
  * `[floor(lo/W), floor(hi/W)]` — bucketing admits no false negatives
  * even with double rounding, and the re-applied original predicate
  * removes every false positive. Hence result-identical to the
  * un-rewritten join (asserted against the same DuckDB oracle in
  * BandedRangeJoinSpec).
  *
  * Why a Rule and not a rewritten query: `star/Joins.rangeJoinBanded`
  * IS the hand-written form; this rule applies the same transformation
  * to ANY user query of the matching shape, turning an O(|probe|x
  * |build|) nested-loop plan into a hash join without the user knowing
  * the trick. Registered via `GraftExtensions.injectOptimizerRule`;
  * idempotent (the rewritten condition's leading bucket-equality stops
  * the pattern from matching again).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  /** Strip no-op numeric casts to expose the arithmetic shape; bucket
    * expressions are built from the ORIGINAL (typed) expressions. */
  private def strip(e: Expression): Expression = e match {
    case Cast(child, _, _, _) => strip(child)
    case other => other
  }

  private def litDouble(e: Expression): Option[Double] = strip(e) match {
    case Literal(v, t) if t.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
      Some(v.toString.toDouble)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(And(
        GreaterThanOrEqual(a1, lo), LessThanOrEqual(a2, hi))), hint)
        if a1.semanticEquals(a2) =>
      val rewritten = for {
        (b1, c1) <- strip(lo) match {
          case Subtract(b, c, _) => litDouble(c).map(v => (b, v))
          case _ => None
        }
        (b2, c2) <- strip(hi) match {
          case Add(b, c, _) => litDouble(c).map(v => (b, v))
          case Add(c, b, _) if litDouble(c).isDefined && litDouble(b).isEmpty =>
            litDouble(c).map(v => (b, v))
          case _ => None
        }
        if b1.semanticEquals(b2) && c1 + c2 > 0
        // a strictly from one child, b strictly from the other
        if a1.references.subsetOf(left.outputSet) &&
          b1.references.subsetOf(right.outputSet)
      } yield {
        val w = Literal(c1 + c2, DoubleType)
        def bucketOf(e: Expression): Expression =
          Floor(Divide(Cast(e, DoubleType), w))
        val bandL = Alias(bucketOf(a1), "_band_probe")()
        val probeSide = Project(left.output :+ bandL, left)
        val seq = Sequence(
          bucketOf(Subtract(Cast(b1, DoubleType), Literal(c1, DoubleType))),
          bucketOf(Add(Cast(b1, DoubleType), Literal(c2, DoubleType))),
          Some(Literal(1L)))
        val bandR = AttributeReference("_band_build", LongType, nullable = false)()
        val buildSide = Generate(Explode(seq), Nil, outer = false, None,
          Seq(bandR), right)
        val cond = And(EqualTo(bandL.toAttribute, bandR), j.condition.get)
        Project(j.output, Join(probeSide, buildSide, Inner, Some(cond), hint))
      }
      rewritten.getOrElse(j)
  }
}

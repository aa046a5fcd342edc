package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

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
  * The monotonicity argument needs one more ingredient: the bucket key
  * is computed in DOUBLE while the re-applied predicate evaluates in
  * the comparison's original type, so a value whose double conversion
  * rounds (bigint above 2^53, decimal precision > 15) can land in a
  * probe bucket outside the build side's rounded covering range and
  * silently drop a true match (e.g. bigint b = 2^54+2, c1 = c2 = 1:
  * a = b-1 rounds DOWN a whole bucket while the build coverage rounds
  * up). Two defenses make the rewrite airtight:
  *
  *  1. a type guard ([[maxAbsAsDouble]]): the rule only fires when the
  *     analyzed comparison type bounds |value| well below 2^53 —
  *     byte/short/int, float/double (conversion exact; for a double
  *     comparison the predicate itself runs in the same double
  *     arithmetic), or decimal with precision <= 15. bigint and wider
  *     decimals keep the (correct, slower) nested-loop plan, because
  *     their double rounding error (up to ulp = 1024 at 2^63) is
  *     unbounded relative to any fixed bucket width;
  *  2. the guard additionally requires 4*maxAbs*2^-53 < W — the worst
  *     accumulated conversion+arithmetic rounding across the probe and
  *     build bucket expressions — so every computed bucket index is
  *     within 1 of the exact-arithmetic index, and the build coverage
  *     is PADDED by 2 buckets on each side to absorb that misalignment
  *     (<= 6 build rows per input row instead of <= 2; false positives
  *     are removed by the re-applied exact predicate as before).
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

  /** Largest |value| the comparison type admits, as seen by the double
    * bucket arithmetic; None = type not safe to bucket in double (see
    * the class doc). 0.0 marks float/double: conversion is exact and
    * the re-applied predicate evaluates in the very same double
    * arithmetic, so no conversion slop exists at all. */
  private def maxAbsAsDouble(dt: DataType): Option[Double] = dt match {
    case ByteType | ShortType | IntegerType => Some(math.pow(2, 31))
    case FloatType | DoubleType => Some(0.0)
    case d: DecimalType if d.precision <= 15 =>
      Some(math.pow(10, d.precision - d.scale))
    case _ => None // LongType, DecimalType(p>15), non-numeric
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
          // accept the literal on either side of the +; a first
          // `case Add(b, c, _)` alone would swallow Add(lit, expr)
          // shapes and never rewrite them (it matches every Add)
          case Add(x, y, _) =>
            if (litDouble(y).isDefined) litDouble(y).map(v => (x, v))
            else litDouble(x).map(v => (y, v))
          case _ => None
        }
        if b1.semanticEquals(b2) && c1 + c2 > 0
        // a strictly from one child, b strictly from the other
        if a1.references.subsetOf(left.outputSet) &&
          b1.references.subsetOf(right.outputSet)
        // double bucket arithmetic must be within one bucket of exact
        maxAbs <- maxAbsAsDouble(a1.dataType)
        if 4.0 * maxAbs * math.pow(2, -53) < c1 + c2
      } yield {
        val w = Literal(c1 + c2, DoubleType)
        def bucketOf(e: Expression): Expression =
          Floor(Divide(Cast(e, DoubleType), w))
        val bandL = Alias(bucketOf(a1), "_band_probe")()
        val probeSide = Project(left.output :+ bandL, left)
        // coverage padded +-2 buckets: absorbs the <=1-bucket rounding
        // misalignment between the probe and build bucket expressions
        val seq = Sequence(
          Subtract(bucketOf(Subtract(Cast(b1, DoubleType), Literal(c1, DoubleType))),
            Literal(2L)),
          Add(bucketOf(Add(Cast(b1, DoubleType), Literal(c2, DoubleType))),
            Literal(2L)),
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

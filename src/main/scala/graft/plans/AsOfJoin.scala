package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join (SURVEY.md §2.3 J5, §2.10 tier (c)):
  * logical node + planner strategy + physical single-pass merge.
  *
  * Spark has no as-of join; the compositional form (graft.star.Joins
  * union-tag + running last() window) materializes a union of both
  * streams through one shuffle AND a window sort. This operator does the
  * textbook merge instead: both sides hash-partitioned on the key and
  * sorted (key, ts) — requirements Catalyst satisfies with exactly one
  * exchange per side — then a per-partition two-pointer scan emits, for
  * every left row, the latest right row with the same key and
  * right.ts <= left.ts (inclusive; LEFT OUTER semantics). One pass, no
  * row duplication, no window buffer: at 100 TB the only cost is the
  * same co-partitioning a sort-merge equi-join would pay.
  *
  * The DuckDB `ASOF LEFT JOIN` oracle that checks the compositional
  * form checks this operator too (query `join_asof_native`).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one hash exchange per side, co-partitioned on the key
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // sorted (key, ts) within partitions -> single forward merge pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.size
    val outAttrs = output

    val fwd = forward
    val tol = toleranceMicros

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      // tolerance: the PICKED match must lie within tol of the left ts
      // (filter-the-pick, pandas merge_asof semantics); ts values are
      // long-backed (timestamp micros / bigint), enforced by AsOf.join
      def withinTol(rt: Any, lt: Any): Boolean = tol.forall { t =>
        val d = lt.asInstanceOf[Long] - rt.asInstanceOf[Long]
        if (fwd) -d <= t else d <= t
      }
      var candidate: InternalRow = null
      var candidateKey: Any = null
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (fwd) {
          // consume rights strictly BEHIND the probe (key passed, or
          // same key with ts < lt); the head is then the first right at
          // ts >= lt — peeked, not consumed: a later left row at the
          // same or a later ts may need the same right
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val c = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
            if (c < 0 || (c == 0 && tsOrd.compare(
                rTsB.eval(head).asInstanceOf[AnyRef],
                lt.asInstanceOf[AnyRef]) < 0)) rBuf.next()
            else advancing = false
          }
          val matched = rBuf.hasNext && {
            val head = rBuf.head
            keyOrd.compare(rKeyB.eval(head).asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef]) == 0 &&
              withinTol(rTsB.eval(head), lt)
          }
          toUnsafe(joiner(lRow, if (matched) rBuf.head else nullRight))
        } else {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val c = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
            if (c < 0) {
              rBuf.next() // right key already passed by the sorted left side
            } else if (c == 0 && tsOrd.compare(
                rTsB.eval(head).asInstanceOf[AnyRef], lt.asInstanceOf[AnyRef]) <= 0) {
              candidate = rBuf.next().copy() // latest right at ts <= left ts
              candidateKey = rk
            } else advancing = false
          }
          val matched = candidate != null && keyOrd.compare(
            candidateKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0 &&
            withinTol(rTsB.eval(candidate), lt)
          toUnsafe(joiner(lRow, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical merge. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, fwd, tol) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object AsOf {
  /** Left as-of join: every left row + the nearest right row with the
    * same key — the latest at right ts <= left ts (backward, default)
    * or the earliest at right ts >= left ts (`forward = true`). An
    * optional `toleranceMicros` nulls out a picked match farther than
    * the tolerance from the left ts (pandas merge_asof semantics: the
    * pick is filtered, never replaced by a farther row). Right columns
    * are suffixed to keep outputs unambiguous (also what makes
    * self-joins safe). Tolerance requires a long-backed ts (timestamp
    * micros or bigint). */
  def join(left: DataFrame, right: DataFrame,
      key: String, ts: String, rightSuffix: String = "_r",
      forward: Boolean = false,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val r = right.toDF(right.columns.toIndexedSeq.map(_ + rightSuffix): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val lTs = attr(lPlan, ts)
    if (toleranceMicros.isDefined) {
      val ok = lTs.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      require(ok, s"tolerance needs a long-backed ts, got ${lTs.dataType}")
    }
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key + rightSuffix),
      lTs, attr(rPlan, ts + rightSuffix),
      forward, toleranceMicros)
    org.apache.spark.sql.GraftShim.ofRows(spark, plan)
  }
}

package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (SURVEY.md §2.10 `[EXT]`): weighted ratio
  * aggregator — `sum(num)/sum(den)` with NULL on zero denominator, the
  * aggregate form of the reference's guarded delay-rate KPI
  * (`NB_AIRLINE_DELAY_GOLD (1).ipynb:441-445`).
  *
  * The buffer accumulates in exact scale-5 BigDecimal (same rounding as
  * `CAST(x AS DECIMAL(28,5))`, Det.scala), so results are identical at
  * any partition order/count and bit-equal to the SQL
  * `CAST(SUM(CAST(num AS DECIMAL(28,5))) AS DOUBLE) / ...` oracle form.
  *
  * Scale posture: an `Aggregator` participates in partial aggregation —
  * `reduce` runs map-side, `merge` combines partition buffers, so the
  * shuffle carries one (num, den) pair per group per partition.
  */
object WeightedRateAggregator
    extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), java.lang.Double] {

  private def dec5(d: Double): JBigDecimal =
    new JBigDecimal(d).setScale(5, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal),
      in: (Double, Double)): (JBigDecimal, JBigDecimal) =
    (b._1.add(dec5(in._1)), b._2.add(dec5(in._2)))

  override def merge(a: (JBigDecimal, JBigDecimal),
      b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(r: (JBigDecimal, JBigDecimal)): java.lang.Double =
    if (r._2.signum == 0) null
    else java.lang.Double.valueOf(r._1.doubleValue() / r._2.doubleValue())

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine deterministic numeric helpers.
  *
  * The driver's correctness gate hash-compares our Spark results against
  * DuckDB running `SparkEntry.oracleSql` on the same parquet. Plain
  * `SUM(double)` is order-dependent (partition order differs between the
  * engines and between runs), so every aggregate that feeds the oracle is
  * summed in exact DECIMAL(28,5) arithmetic and only then converted back
  * to DOUBLE. Decimal addition is associative/commutative, so both engines
  * produce the identical decimal, and the scale is chosen so the sum's
  * unscaled value stays below 2^53 — in that range decimal->double is
  * exact in BOTH engines (DuckDB's decimal->double goes int128->double
  * then /10^scale, which double-rounds above 2^53; scale 5 keeps sums up
  * to ~9e10 exact). Input metrics are 2dp-grid money values, so scale 5
  * loses nothing. Result: bit-identical aggregates at any parallelism —
  * the same query on 1000 executors hashes the same as on local[32].
  *
  * Each Scala helper has a SQL twin (`sql*`) used to build the DuckDB
  * oracle text, guaranteeing the two sides stay in lockstep.
  */
object Det {
  val SumDec: DecimalType = DecimalType(28, 5)

  /** Order-independent SUM over doubles (exact decimal accumulation). */
  def xsum(c: Column): Column = sum(c.cast(SumDec)).cast(DoubleType)
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,5))) AS DOUBLE)"

  /** Order-independent AVG (decimal sum / non-null count, divided as
    * doubles so both engines perform the same single IEEE division). */
  def xavg(c: Column): Column = xsum(c) / count(c)
  def sqlAvg(e: String): String = s"(${sqlSum(e)} / COUNT($e))"
  // NOTE: quotient-valued columns (e.g. per-row delay_rate) are full-
  // mantissa doubles; the scale-5 cast rounds them identically in both
  // engines (a tie would need the double within ~1 ulp of a 5e-6
  // half-point — probability ~1e-11 per cell).

  /** n/d with NULL on zero denominator (SQL `n / NULLIF(d, 0)` shape —
    * SURVEY.md §2.2 P4). */
  def nullRatio(n: Column, d: Column): Column =
    when(d === 0, lit(null).cast(DoubleType)).otherwise(n / d)
  def sqlNullRatio(n: String, d: String): String =
    s"CASE WHEN $d = 0 THEN CAST(NULL AS DOUBLE) ELSE $n / $d END"

  /** n/d with 0 on zero denominator (the reference's
    * `CASE WHEN SUM(x)=0 THEN 0 ELSE y/NULLIF(x,0) END` guard,
    * NB_AIRLINE_DELAY_GOLD nb:441-445). */
  def zeroRatio(n: Column, d: Column): Column =
    when(d === 0, lit(0.0)).otherwise(n / d)
  def sqlZeroRatio(n: String, d: String): String =
    s"CASE WHEN $d = 0 THEN CAST(0 AS DOUBLE) ELSE $n / $d END"

  /** DuckDB ORDER BY matching Spark's ascending default (nulls first). */
  def sqlOrderBy(cols: Seq[String]): String =
    cols.map(c => s"$c NULLS FIRST").mkString(" ORDER BY ", ", ", "")

  /** WindowExec warns "No Partition Defined ... serious performance
    * degradation" for any unpartitioned window. Ours (the monthly-trend
    * windows, Windows.scala; the causes pie total, Views.scala) run
    * over pre-aggregated frames bounded at |months| (~84) or |causes|
    * (5) rows at ANY data scale, so the warning is a false alarm here —
    * silence that single logger in the harness mains so bench tails
    * show real signals only. */
  def silenceBenignWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}

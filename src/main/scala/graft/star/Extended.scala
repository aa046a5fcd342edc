package graft.star

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.sqlOrderBy
import graft.functions.WeightedRateAggregator
import graft.pipeline.FlightPipeline

/** UDAF + Generator coverage (SURVEY.md §2.10): the custom typed
  * Aggregator in a real grouped query, and an explode-based generator
  * query — both oracle-checked.
  */
object Extended {

  /** Weighted delay rate per carrier via the custom Aggregator — the
    * UDAF result must equal the relational sum/sum form (that is
    * literally its DuckDB oracle). */
  def udafWeightedRate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wr = udaf(WeightedRateAggregator)
    FlightPipeline.silver(spark, dir)
      .groupBy($"carrier")
      .agg(wr($"arr_del15", $"arr_flights").as("weighted_delay_rate"),
        count(lit(1)).as("n_rows"))
      .orderBy($"carrier")
  }

  val udafWeightedRateSql: String = FlightPipeline.withCtes(
    s"""
       |, g AS (
       |  SELECT carrier,
       |    CAST(SUM(CAST(arr_del15 AS DECIMAL(28,5))) AS DOUBLE) AS num,
       |    CAST(SUM(CAST(arr_flights AS DECIMAL(28,5))) AS DOUBLE) AS den,
       |    COUNT(*) AS n_rows
       |  FROM master GROUP BY carrier
       |)
       |SELECT carrier,
       |  CASE WHEN den = 0 THEN CAST(NULL AS DOUBLE) ELSE num / den END
       |    AS weighted_delay_rate,
       |  n_rows
       |FROM g${sqlOrderBy(Seq("carrier"))}""".stripMargin)

  /** Generator query: explode every embedding value into 0.05-wide
    * buckets — a 320k-row explode collapsed by a partial-aggregating
    * count, the canonical explode->aggregate shape. Min/max are
    * order-independent; the mean goes through DECIMAL(28,9) (scale
    * chosen so the grand sum's unscaled value stays < 2^53 even at
    * sf1+ — see Det.scala). */
  def embedHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "embeddings")
      .select(explode($"embedding").as("x"))
      .select(floor($"x".cast("double") * 20).cast("int").as("bucket"),
        $"x".cast("double").as("xd"))
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("n_values"),
        min($"xd").as("min_value"),
        max($"xd").as("max_value"),
        (sum($"xd".cast("decimal(28,9)")).cast("double") / count(lit(1)))
          .as("mean_value"))
      .orderBy($"bucket")
  }

  val embedHistogramSql: String =
    s"""WITH v AS (
       |  SELECT CAST(unnest(embedding) AS DOUBLE) AS xd FROM embeddings
       |),
       |b AS (SELECT CAST(floor(xd * 20) AS INTEGER) AS bucket, xd FROM v)
       |SELECT bucket,
       |  COUNT(*) AS n_values,
       |  MIN(xd) AS min_value,
       |  MAX(xd) AS max_value,
       |  CAST(SUM(CAST(xd AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS mean_value
       |FROM b GROUP BY bucket${sqlOrderBy(Seq("bucket"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_udaf_weighted_rate" -> udafWeightedRate,
    "embed_value_histogram" -> embedHistogram)

  val oracles: Map[String, String] = Map(
    "agg_udaf_weighted_rate" -> udafWeightedRateSql,
    "embed_value_histogram" -> embedHistogramSql)
}

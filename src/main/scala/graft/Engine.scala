package graft

import org.apache.spark.sql.SparkSession

/** SQL serving facade (SURVEY.md §3.3): the reference's warehouse layer
  * is Snowflake tables + named views queried by a dashboard; here the
  * same surface is Spark temp views over the engine's DataFrames, so a
  * user can run raw `spark.sql` against every layer:
  *
  * {{{
  * graft.Engine.open(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT * FROM v_monthly_trend WHERE year = 1996")
  * spark.sql("SELECT * FROM gold_carrier ORDER BY total_flights DESC")
  * }}}
  *
  * Views are lazy logical plans — registering them costs nothing until
  * queried, and every query through them gets the same Catalyst
  * optimization as the DataFrame API.
  */
object Engine {

  /** Register the raw star schema, the medallion layers, and the five
    * serving views (nb:433-537) as temp views. Idempotent. */
  def open(spark: SparkSession, dir: String): Unit = {
    for (t <- Tables.names)
      Tables(spark, dir, t).createOrReplaceTempView(t)
    functions.DecodeTrimJson.register(spark)
    pipeline.FlightPipeline.silver(spark, dir)
      .createOrReplaceTempView("silver_flight_delays")
    pipeline.FlightPipeline.master(spark, dir)
      .createOrReplaceTempView("gold_master")
    pipeline.Gold.goldCarrier(spark, dir).createOrReplaceTempView("gold_carrier")
    pipeline.Gold.goldMonthly(spark, dir).createOrReplaceTempView("gold_monthly")
    pipeline.Gold.goldCauses(spark, dir).createOrReplaceTempView("gold_causes")
    pipeline.Views.overallKpis(spark, dir)
      .createOrReplaceTempView("v_overall_kpis")
    pipeline.Views.monthlyTrend(spark, dir)
      .createOrReplaceTempView("v_monthly_trend")
    pipeline.Views.topCarriers(spark, dir)
      .createOrReplaceTempView("v_top_carriers")
    pipeline.Views.causesPct(spark, dir)
      .createOrReplaceTempView("v_causes_pct")
    pipeline.Views.masterClean(spark, dir)
      .createOrReplaceTempView("v_master_clean")
  }
}

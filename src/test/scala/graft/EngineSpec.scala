package graft

/** The SQL serving surface: raw spark.sql against every layer. */
class EngineSpec extends SparkSpec {

  test("open registers tables, medallion layers, and serving views") {
    Engine.open(spark, sf0001)
    // raw star schema
    assert(spark.sql("SELECT count(*) FROM lineitem").head.getLong(0) > 0)
    // silver + gold layers
    assert(spark.sql(
      "SELECT count(*) FROM silver_flight_delays WHERE arr_flights = 0")
      .head.getLong(0) > 0)
    assert(spark.sql(
      "SELECT * FROM gold_monthly WHERE year = 1996 ORDER BY month")
      .count() > 0)
    // serving views with the dashboard query shapes (nb:550-645)
    assert(spark.sql("SELECT * FROM v_overall_kpis").count() == 1)
    val top = spark.sql(
      """SELECT carrier, total_flights FROM v_top_carriers
        |ORDER BY total_flights DESC LIMIT 3""".stripMargin)
    assert(top.count() == 3)
    // ad-hoc SQL joining a view against a raw table still optimizes
    val joined = spark.sql(
      """SELECT m.year, count(*) AS n
        |FROM v_monthly_trend m JOIN orders o
        |  ON year(o.o_orderdate) = m.year
        |GROUP BY m.year ORDER BY m.year""".stripMargin)
    assert(joined.count() > 0)
  }
}

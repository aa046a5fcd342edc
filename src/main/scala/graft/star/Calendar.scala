package graft.star

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.{sqlOrderBy, sqlSum}

/** Calendar-spine operators (`[EXT]`): a generated date dimension and
  * gap-filled time series — the two moves every BI layer needs that a
  * raw fact table cannot answer ("which months had NO sales" requires
  * rows that do not exist). Both derive the spine bounds from the data
  * with an aggregate → `sequence` → `explode` chain: no driver
  * collect, no hand-maintained calendar table, and the spine stays
  * |days| or |months| rows at ANY fact-table scale — generation cost
  * is independent of data volume.
  */
object Calendar {

  /** Date dimension spanning the fact table's order-date range:
    * ISO weekday arithmetic (Monday = 0) keeps both engines on the
    * same day-numbering convention (Spark `weekday` = DuckDB
    * `isodow - 1`). */
  def dimCalendar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .agg(min(to_date($"o_orderdate")).as("lo"),
        max(to_date($"o_orderdate")).as("hi"))
      .select(explode(sequence($"lo", $"hi")).as("d"))
      .select($"d",
        year($"d").as("y"),
        month($"d").as("mo"),
        quarter($"d").as("q"),
        weekday($"d").as("dow"),
        (weekday($"d") >= 5).cast("int").as("is_weekend"))
      .orderBy($"d")
  }

  val dimCalendarSql: String =
    s"""WITH b AS (
       |  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
       |         MAX(CAST(o_orderdate AS DATE)) AS hi
       |  FROM orders
       |),
       |s AS (
       |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
       |  FROM b
       |)
       |SELECT d,
       |  CAST(year(d) AS INTEGER) AS y,
       |  CAST(month(d) AS INTEGER) AS mo,
       |  CAST(quarter(d) AS INTEGER) AS q,
       |  CAST(isodow(d) - 1 AS INTEGER) AS dow,
       |  CAST(isodow(d) - 1 >= 5 AS INTEGER) AS is_weekend
       |FROM s${sqlOrderBy(Seq("d"))}""".stripMargin

  /** Gap-filled monthly revenue per order priority: the month spine ×
    * priority grid left-joins the actual monthly aggregate, zero-
    * filling absent cells — so "no sales that month" is a ROW, not an
    * inference. The spine (|months| × |priorities|) is broadcast
    * against the aggregate; the fact table is touched once. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir, "orders")
      .select($"o_orderpriority",
        trunc(to_date($"o_orderdate"), "month").as("m"),
        $"o_totalprice")
    val monthly = o.groupBy($"m", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        graft.Det.xsum($"o_totalprice").as("revenue"))
    val spine = o
      .agg(min($"m").as("lo"), max($"m").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("m"))
      .crossJoin(o.select($"o_orderpriority").distinct())
    spine.join(monthly, Seq("m", "o_orderpriority"), "left")
      .select($"m", $"o_orderpriority",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"revenue", lit(0.0)).as("revenue"))
      .orderBy($"m", $"o_orderpriority")
  }

  val gapFillSql: String =
    s"""WITH o AS (
       |  SELECT o_orderpriority,
       |    CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
       |    o_totalprice
       |  FROM orders
       |),
       |monthly AS (
       |  SELECT m, o_orderpriority, COUNT(*) AS n_orders,
       |    ${sqlSum("o_totalprice")} AS revenue
       |  FROM o GROUP BY 1, 2
       |),
       |b AS (SELECT MIN(m) AS lo, MAX(m) AS hi FROM o),
       |spine AS (
       |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS m
       |  FROM b
       |),
       |grid AS (
       |  SELECT m, o_orderpriority
       |  FROM spine CROSS JOIN (SELECT DISTINCT o_orderpriority FROM o)
       |)
       |SELECT grid.m, grid.o_orderpriority,
       |  COALESCE(n_orders, 0) AS n_orders,
       |  COALESCE(revenue, CAST(0 AS DOUBLE)) AS revenue
       |FROM grid LEFT JOIN monthly
       |  ON grid.m = monthly.m AND grid.o_orderpriority = monthly.o_orderpriority
       |${sqlOrderBy(Seq("grid.m", "grid.o_orderpriority")).trim}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dim_calendar" -> dimCalendar,
    "orders_gap_fill" -> gapFill)

  val oracles: Map[String, String] = Map(
    "dim_calendar" -> dimCalendarSql,
    "orders_gap_fill" -> gapFillSql)
}

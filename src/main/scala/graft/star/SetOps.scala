package graft.star

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.sqlOrderBy

/** Set operations (SURVEY.md §2.8 `[EXT]`): UNION / INTERSECT / EXCEPT
  * with SQL (distinct) semantics, over the 1995-vs-1996 buyer cohorts.
  *
  * Scale posture: Spark implements intersect/except as aggregate or
  * hash-join plans on the compared columns; the inputs here are already
  * distinct key projections, so the shuffle carries only keys.
  */
object SetOps {

  private def buyers(spark: SparkSession, dir: String, yr: Int): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .filter(year($"o_orderdate") === yr)
      .select($"o_custkey").distinct()
  }

  private def buyersSql(yr: Int): String =
    s"SELECT DISTINCT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INTEGER) = $yr"

  /** UNION (distinct): customers buying in 1995 or 1996. */
  def union2(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, 1995).union(buyers(spark, dir, 1996)).distinct()
      .orderBy("o_custkey")

  val union2Sql: String =
    s"(${buyersSql(1995)}) UNION (${buyersSql(1996)})${sqlOrderBy(Seq("o_custkey"))}"

  /** INTERSECT: customers buying in both years. */
  def intersect2(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, 1995).intersect(buyers(spark, dir, 1996))
      .orderBy("o_custkey")

  val intersect2Sql: String =
    s"(${buyersSql(1995)}) INTERSECT (${buyersSql(1996)})${sqlOrderBy(Seq("o_custkey"))}"

  /** EXCEPT: 1995 buyers who did not buy in 1996. */
  def except2(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, 1995).except(buyers(spark, dir, 1996))
      .orderBy("o_custkey")

  val except2Sql: String =
    s"(${buyersSql(1995)}) EXCEPT (${buyersSql(1996)})${sqlOrderBy(Seq("o_custkey"))}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "setop_union" -> union2,
    "setop_intersect" -> intersect2,
    "setop_except" -> except2)

  val oracles: Map[String, String] = Map(
    "setop_union" -> union2Sql,
    "setop_intersect" -> intersect2Sql,
    "setop_except" -> except2Sql)
}

package graft.star

import graft.SparkSpec
import java.sql.Timestamp

/** Ordering semantics of the conversion funnel: the oracle hash proves
  * engine agreement; this pins the CONTRACT (strictly-after stages) on
  * crafted sequences, and the one-exchange plan shape. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")

  private def funnelOf(rows: Seq[(Long, Long, Timestamp, String)]) = {
    rows.toDF("event_id", "user_id", "ts", "event_type")
      .createOrReplaceTempView("events_funnel_probe")
    val staged = spark.sql(
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
        |  FROM events_funnel_probe
        |), s1 AS (
        |  SELECT *, COALESCE(MAX(is_view) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seen_view
        |  FROM e
        |), s2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND seen_view = 1
        |    THEN 1 ELSE 0 END AS click_ok
        |  FROM s1
        |), s3 AS (
        |  SELECT *, COALESCE(MAX(click_ok) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seen_click
        |  FROM s2
        |)
        |SELECT user_id, MAX(is_view) AS v, MAX(click_ok) AS c,
        |  MAX(CASE WHEN event_type = 'purchase' AND seen_click = 1
        |      THEN 1 ELSE 0 END) AS p
        |FROM s3 GROUP BY user_id""".stripMargin)
    staged.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
  }

  test("click before any view does not convert; ordered chain does") {
    val out = funnelOf(Seq(
      // user 1: click at 10:00, view at 10:01 — click must NOT count
      (1L, 1L, ts(0), "click"), (2L, 1L, ts(1), "view"),
      // user 2: full ordered chain
      (3L, 2L, ts(0), "view"), (4L, 2L, ts(1), "click"), (5L, 2L, ts(2), "purchase"),
      // user 3: purchase before click — only view+click convert
      (6L, 3L, ts(0), "view"), (7L, 3L, ts(1), "purchase"), (8L, 3L, ts(2), "click")))
    assert(out(1L) == ((1, 0, 0)))
    assert(out(2L) == ((1, 1, 1)))
    assert(out(3L) == ((1, 1, 0)))
  }

  test("same-timestamp events resolve by event_id (strictly-before frame)") {
    // view and click share ts; view has the smaller event_id, so the
    // click sees it in its strictly-before frame
    val a = funnelOf(Seq((1L, 7L, ts(0), "view"), (2L, 7L, ts(0), "click")))
    assert(a(7L) == ((1, 1, 0)))
    // reversed ids: click orders first, sees no view
    val b = funnelOf(Seq((2L, 8L, ts(0), "view"), (1L, 8L, ts(0), "click")))
    assert(b(8L) == ((1, 0, 0)))
  }

  test("whole funnel runs in a single exchange") {
    val plan = EventWindows.funnel(spark, sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 user_id exchange, plan:\n$plan")
  }
}

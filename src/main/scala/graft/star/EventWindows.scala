package graft.star

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import graft.Det.{sqlSum, sqlOrderBy}

/** Event-time windowing beyond tumbling (SURVEY.md §2.9 T5 extension
  * tier): gap-based sessionization via Spark's native `session_window`
  * and sliding windows via `window(ts, len, slide)` — each checked
  * against an independent DuckDB formulation (lag+cumsum for sessions,
  * window-enumeration for sliding), so the built-in operators' semantics
  * are verified, not assumed.
  *
  * Scale posture: both group by (user/window) after a single shuffle;
  * session_window in batch mode sorts within user partitions — state
  * never exceeds a user's events in a task. The sliding window fan-out
  * is exactly len/slide rows per event (2x here), expanded *before*
  * partial aggregation so the shuffle carries window aggregates.
  */
object EventWindows {

  /** 30-minute-gap sessions per user: native session_window. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        Det.xsum($"value").as("total_value"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events", $"total_value")
      .orderBy($"user_id", $"session_start")
  }

  /** Oracle: the classic lag+cumsum sessionization. Spark's
    * session_window end = last event + gap. */
  val sessionizeSql: String =
    s"""WITH g AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |              <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
       |  FROM events
       |),
       |s AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM g
       |)
       |SELECT user_id,
       |  MIN(ts) AS session_start,
       |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS total_value
       |FROM s GROUP BY user_id, session_id${sqlOrderBy(Seq("user_id", "session_start"))}""".stripMargin

  /** Sliding 10-minute windows every 5 minutes, per event type. */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        Det.xsum($"value").as("total_value"))
      .select($"w.start".as("window_start"), $"event_type",
        $"n_events", $"total_value")
      .orderBy($"window_start", $"event_type")
  }

  /** Oracle: enumerate the two 5-min-aligned windows containing each
    * event ([trunc5(ts) - i*5min, +10min) for i in 0..1). */
  val slidingSql: String =
    s"""WITH e AS (
       |  SELECT event_type, value,
       |    time_bucket(INTERVAL 5 MINUTE, ts) - i * INTERVAL 5 MINUTE AS window_start
       |  FROM events, (SELECT unnest(range(2)) AS i)
       |)
       |SELECT window_start, event_type,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS total_value
       |FROM e GROUP BY window_start, event_type${sqlOrderBy(Seq("window_start", "event_type"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sessionize" -> sessionize,
    "events_sliding" -> sliding)

  val oracles: Map[String, String] = Map(
    "events_sessionize" -> sessionizeSql,
    "events_sliding" -> slidingSql)
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import StatefulTotals.{UserActivity, UserTotals}

/** mapGroupsWithState: state accumulates across micro-batches per key,
  * untouched keys emit nothing in update mode. */
class StatefulTotalsSpec extends SparkSpec {

  test("per-user running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserActivity]
    val q = StatefulTotals.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(StatefulTotals.outputMode).start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      mem.addData(
        UserActivity(1, t("2024-01-01 00:00:01"), 10.0),
        UserActivity(1, t("2024-01-01 00:00:02"), 5.0),
        UserActivity(2, t("2024-01-01 00:00:03"), 7.0))
      q.processAllAvailable()
      val b1 = spark.table("totals").as[UserTotals].collect()
        .map(u => u.user_id -> (u.n_events, u.total_value)).toMap
      assert(b1(1L) == (2L, 15.0) && b1(2L) == (1L, 7.0))

      mem.addData(UserActivity(1, t("2024-01-01 00:01:00"), 3.0))
      q.processAllAvailable()
      val rows = spark.table("totals").as[UserTotals].collect()
      // update mode: only user 1 re-emitted, with accumulated state
      assert(rows.count(_.user_id == 1L) == 2)
      assert(rows.filter(_.user_id == 1L).map(_.total_value).max == 18.0)
      assert(rows.count(_.user_id == 2L) == 1, "untouched key not re-emitted")
    } finally q.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import SessionClose.{SessionSummary, UserActivity}

/** Event-time timers: a session summary appears exactly once, and only
  * after the watermark passes last-event + gap; events inside the gap
  * extend the session instead of closing it. */
class SessionCloseSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("session closes only when the watermark passes the gap timer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[UserActivity]
    val q = SessionClose.sessions(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      // batch 1: two events 30s apart — watermark (max - 1s) is far
      // below last + 60s gap, so nothing closes
      mem.addData(
        UserActivity(1, t("2024-01-01 10:00:00"), 5.0),
        UserActivity(1, t("2024-01-01 10:00:30"), 7.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)

      // batch 2: same user, inside the gap — extends the session
      // (re-arms the timer), still nothing closes
      mem.addData(UserActivity(1, t("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)

      // batch 3: another user far in the future pushes the watermark
      // past 10:01:00 + 60s -> user 1's session closes with all 3
      // events; user 2's own session stays open
      mem.addData(UserActivity(2, t("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").as[SessionSummary].collect()
      assert(rows.length == 1)
      val s = rows.head
      assert(s.user_id == 1L && s.n_events == 3L && s.total_value == 14.0)
      assert(s.session_start == t("2024-01-01 10:00:00"))
      assert(s.session_end == t("2024-01-01 10:01:00"))

      // batch 4: push the watermark again -> user 2 closes exactly once
      mem.addData(UserActivity(3, t("2024-01-01 11:30:00"), 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[SessionSummary].collect()
      assert(all.length == 2)
      assert(all.count(_.user_id == 1L) == 1, "no duplicate close")
      assert(all.exists(r => r.user_id == 2L && r.n_events == 1L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}

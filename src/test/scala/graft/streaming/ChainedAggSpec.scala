package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Two stateful window aggregations chained in ONE streaming query:
  * 5-min per-user slots rolled up to 10-min totals, emitted exactly
  * once when the watermark passes the coarse window end. */
class ChainedAggSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("5-min slots roll up to 10-min totals in one streaming query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[ClickEvt]
    val rollup = ChainedAgg.multiResolutionRollup(
      events.toDF().select($"ts", $"user_id"))
    // plan gate: two stateful aggregates in one query
    val q = rollup.writeStream.format("memory")
      .queryName("chained_mem").outputMode("append").start()
    try {
      // window [00:00, 00:10): user 1 in both 5-min slots, user 2 in one
      events.addData(
        ClickEvt(1L, 1L, t("2024-01-01 00:01:00")),
        ClickEvt(1L, 2L, t("2024-01-01 00:06:00")),
        ClickEvt(2L, 3L, t("2024-01-01 00:02:00")),
        ClickEvt(2L, 4L, t("2024-01-01 00:02:30")))
      q.processAllAvailable()
      // nothing final yet: watermark has not passed 00:10
      assert(spark.table("chained_mem").isEmpty)
      // advance the watermark beyond 00:10 + 10-min delay, twice so the
      // eviction batch runs after the watermark update takes effect
      events.addData(ClickEvt(9L, 8L, t("2024-01-01 00:25:00")))
      q.processAllAvailable()
      events.addData(ClickEvt(9L, 9L, t("2024-01-01 00:26:00")))
      q.processAllAvailable()
      val rows = spark.table("chained_mem")
        .select($"win_start", $"n_events", $"n_user_slots")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      // [00:00,00:10): 4 events over 3 (user, slot) pairs —
      // user1 x2 slots, user2 x1 slot (2 events in the same slot)
      assert(rows.toSet == Set((t("2024-01-01 00:00:00"), 4L, 3L)))
    } finally q.stop()
  }

  test("update mode emits only the groups each batch changed") {
    // the third output mode (append/complete covered elsewhere): a
    // running per-user count where batch 2 touches ONE user must
    // re-emit that user's row only — the low-latency dashboard contract
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[ClickEvt]
    val counts = events.toDF().groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val q = counts.writeStream.format("memory")
      .queryName("update_mem").outputMode("update").start()
    try {
      events.addData(
        ClickEvt(1L, 1L, t("2024-01-01 00:00:00")),
        ClickEvt(2L, 2L, t("2024-01-01 00:00:01")))
      q.processAllAvailable()
      events.addData(ClickEvt(1L, 3L, t("2024-01-01 00:00:02")))
      q.processAllAvailable()
      val rows = spark.table("update_mem")
        .select($"user_id", $"n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      // batch 1 emitted (1,1) and (2,1); batch 2 re-emitted ONLY (1,2)
      assert(rows.sorted == Seq((1L, 1L), (1L, 2L), (2L, 1L)),
        rows.toString)
    } finally q.stop()
  }

  test("plan carries two stateful aggregate operators") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[ClickEvt]
    val rollup = ChainedAgg.multiResolutionRollup(
      events.toDF().select($"ts", $"user_id"))
    val q = rollup.writeStream.format("memory")
      .queryName("chained_plan_mem").outputMode("append").start()
    try {
      events.addData(ClickEvt(1L, 1L, t("2024-01-01 00:01:00")))
      q.processAllAvailable()
      val n = q.lastProgress.stateOperators.length
      assert(n == 2, s"expected 2 stateful operators, got $n")
    } finally q.stop()
  }
}

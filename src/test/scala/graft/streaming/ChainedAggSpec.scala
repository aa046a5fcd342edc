package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
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

  test("watermarked dedup chains into a windowed aggregate in one query") {
    // the production ingest shape: at-least-once replays are dropped by
    // dropDuplicatesWithinWatermark BEFORE the tumbling count — two
    // different stateful operators, one checkpoint, exactly-once totals
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[ClickEvt]
    val agg = events.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))
    val q = agg.writeStream.format("memory")
      .queryName("dedup_agg_mem").outputMode("append").start()
    try {
      events.addData(
        ClickEvt(1L, 100L, t("2024-01-01 00:01:00")),
        ClickEvt(1L, 100L, t("2024-01-01 00:01:00")), // replay, same id
        ClickEvt(2L, 101L, t("2024-01-01 00:02:00")))
      q.processAllAvailable()
      // replay again in a LATER batch — state must still drop it
      events.addData(ClickEvt(1L, 100L, t("2024-01-01 00:01:00")))
      q.processAllAvailable()
      events.addData(ClickEvt(9L, 200L, t("2024-01-01 00:30:00")))
      q.processAllAvailable()
      events.addData(ClickEvt(9L, 201L, t("2024-01-01 00:31:00")))
      q.processAllAvailable()
      val rows = spark.table("dedup_agg_mem")
        .select($"win_start", $"n").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      // 3 raw rows in [00:00,00:05) but only 2 distinct event ids
      assert(rows(t("2024-01-01 00:00:00")) == 2L, rows.toString)
      assert(q.lastProgress.stateOperators.length == 2)
    } finally q.stop()
  }

  test("foreachBatch commits each micro-batch as a time-travelable version") {
    // streaming + Versioned: every batch lands as an immutable snapshot,
    // so a bad deploy rolls back to the last good version with no
    // stream replay — and history stays queryable
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("vstream").toFile.getAbsolutePath
    val events = MemoryStream[ClickEvt]
    val q = events.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val prev = graft.sources.Versioned.latestVersion(root)
            .map(v => graft.sources.Versioned.read(spark, root, Some(v)))
          val next = prev.map(_.unionByName(batch)).getOrElse(batch)
          graft.sources.Versioned.write(next.localCheckpoint(), root)
          ()
        }
      }
      .start()
    try {
      events.addData(ClickEvt(1L, 1L, t("2024-01-01 00:00:00")))
      q.processAllAvailable()
      events.addData(ClickEvt(2L, 2L, t("2024-01-01 00:01:00")))
      q.processAllAvailable()
      assert(graft.sources.Versioned.read(spark, root).count() == 2)
      // time travel to the first committed batch
      assert(graft.sources.Versioned.read(spark, root, Some(0L)).count() == 1)
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

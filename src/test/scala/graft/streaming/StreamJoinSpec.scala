package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

case class ClickEvt(user_id: Long, event_id: Long, ts: Timestamp)
case class PurchaseEvt(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

/** Stream-stream interval join: in-window purchases attribute to the
  * click, out-of-window and cross-user ones don't, and attribution
  * works across micro-batch boundaries (the build side arrives in a
  * later batch than the probe side). */
class StreamJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("purchases join clicks within 5 minutes, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[ClickEvt]
    val purchases = MemoryStream[PurchaseEvt]
    val joined = StreamJoin.clickToPurchase(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory")
      .queryName("ssjoin_mem").outputMode("append").start()
    try {
      // batch 1: click for users 1 and 2
      clicks.addData(
        ClickEvt(1L, 100L, t("2024-01-01 00:00:00")),
        ClickEvt(2L, 101L, t("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // batch 2 (later micro-batch): user 1 purchases in-window,
      // user 2 purchases out-of-window (6 min), user 3 has no click
      purchases.addData(
        PurchaseEvt(1L, 200L, t("2024-01-01 00:03:00"), 9.99),
        PurchaseEvt(2L, 201L, t("2024-01-01 00:06:00"), 5.00),
        PurchaseEvt(3L, 202L, t("2024-01-01 00:01:00"), 1.00))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_mem")
        .select($"user_id", $"click_id", $"purchase_id", $"purchase_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSet == Set((1L, 100L, 200L, 9.99)))
    } finally q.stop()
  }

  test("join state survives a checkpointed restart") {
    // the click arrives before the stop; the matching purchase arrives
    // after the restart — attribution requires the click's join state
    // to be restored from the state store, not the source replay
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("ssj_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("ssj_ck").toFile.getAbsolutePath
    val clicks = MemoryStream[ClickEvt]
    val purchases = MemoryStream[PurchaseEvt]
    val joined = StreamJoin.clickToPurchase(clicks.toDF(), purchases.toDF())
    def start() = joined.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      clicks.addData(ClickEvt(7L, 300L, t("2024-01-01 00:00:00")))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      purchases.addData(PurchaseEvt(7L, 301L, t("2024-01-01 00:02:00"), 4.2))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
      .select($"user_id", $"click_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == Set((7L, 300L, 301L)))
  }

  test("join state is watermark-bounded (plan carries both watermarks)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[ClickEvt]
    val purchases = MemoryStream[PurchaseEvt]
    val joined = StreamJoin.clickToPurchase(clicks.toDF(), purchases.toDF())
    // two EventTimeWatermark nodes = both sides evictable; without the
    // second watermark + the two-sided bound, click state grows forever
    val plan = joined.queryExecution.logical.toString
    assert("EventTimeWatermark".r.findAllIn(plan).length == 2, plan)
  }

  test("left-outer interval join emits null-padded clicks only after expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[ClickEvt]
    val purchases = MemoryStream[PurchaseEvt]
    val joined = StreamJoin.clickToPurchaseOuter(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory")
      .queryName("ssjoin_outer_mem").outputMode("append").start()
    try {
      // user 1's click matches; user 5's click never will
      clicks.addData(
        ClickEvt(1L, 100L, t("2024-01-01 00:00:00")),
        ClickEvt(5L, 105L, t("2024-01-01 00:00:00")))
      purchases.addData(PurchaseEvt(1L, 200L, t("2024-01-01 00:03:00"), 9.99))
      q.processAllAvailable()
      def rows() = spark.table("ssjoin_outer_mem")
        .select($"click_id", $"purchase_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      // the match emits immediately; the unmatched click must NOT —
      // a matching purchase could still arrive
      assert(rows() == Set((100L, Some(200L))))
      // advance both watermarks past click_ts + 5 min (delay 10 min),
      // twice, so the eviction batch runs after the watermark updates
      clicks.addData(ClickEvt(6L, 106L, t("2024-01-01 00:20:00")))
      purchases.addData(PurchaseEvt(6L, 206L, t("2024-01-01 00:20:00"), 1.0))
      q.processAllAvailable()
      clicks.addData(ClickEvt(7L, 107L, t("2024-01-01 00:21:00")))
      purchases.addData(PurchaseEvt(7L, 207L, t("2024-01-01 00:21:00"), 1.0))
      q.processAllAvailable()
      // user 5's click now emits with NULL purchase columns
      assert(rows().contains((105L, None)), rows())
    } finally q.stop()
  }

  test("full-outer interval join pads BOTH unmatched sides after expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[ClickEvt]
    val purchases = MemoryStream[PurchaseEvt]
    val joined = StreamJoin.clickToPurchaseFull(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory")
      .queryName("ssjoin_full_mem").outputMode("append").start()
    try {
      // user 1 matches; user 5's click and user 9's purchase never will
      clicks.addData(
        ClickEvt(1L, 100L, t("2024-01-01 00:00:00")),
        ClickEvt(5L, 105L, t("2024-01-01 00:00:00")))
      purchases.addData(
        PurchaseEvt(1L, 200L, t("2024-01-01 00:03:00"), 9.99),
        PurchaseEvt(9L, 209L, t("2024-01-01 00:00:30"), 5.0))
      q.processAllAvailable()
      def rows() = spark.table("ssjoin_full_mem")
        .select($"click_id", $"purchase_id").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      // only the match emits before the watermark proves non-matches
      assert(rows() == Set((Some(100L), Some(200L))))
      // advance both watermarks, twice (eviction after the update)
      clicks.addData(ClickEvt(6L, 106L, t("2024-01-01 00:20:00")))
      purchases.addData(PurchaseEvt(6L, 206L, t("2024-01-01 00:20:00"), 1.0))
      q.processAllAvailable()
      clicks.addData(ClickEvt(7L, 107L, t("2024-01-01 00:21:00")))
      purchases.addData(PurchaseEvt(7L, 207L, t("2024-01-01 00:21:00"), 1.0))
      q.processAllAvailable()
      // the unmatched CLICK pads its purchase side, and the unmatched
      // PURCHASE pads its click side — the two-ledger reconciliation
      assert(rows().contains((Some(105L), None)), rows())
      assert(rows().contains((None, Some(209L))), rows())
    } finally q.stop()
  }

  test("stream-static enrichment joins each batch, keeps dim-less events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[ClickEvt]
    val dim = Seq((1L, "gold"), (2L, "silver"))
      .toDF("user_id", "segment")
    val enriched = StreamJoin.enrichWithDim(events.toDF(), dim)
    val q = enriched.writeStream.format("memory")
      .queryName("enrich_mem").outputMode("append").start()
    try {
      events.addData(
        ClickEvt(1L, 300L, t("2024-01-01 00:00:00")),
        ClickEvt(9L, 301L, t("2024-01-01 00:00:01")))
      q.processAllAvailable()
      events.addData(ClickEvt(2L, 302L, t("2024-01-01 00:00:02")))
      q.processAllAvailable()
      val rows = spark.table("enrich_mem")
        .select($"event_id", $"segment")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set(
        (300L, Some("gold")), (301L, None), (302L, Some("silver"))))
      // stateless: no streaming state operator in the executed plan
      val lp = enriched.queryExecution.logical.toString
      assert(!lp.contains("EventTimeWatermark"), lp)
    } finally q.stop()
  }
}

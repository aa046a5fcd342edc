package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import FunnelStream.{Ev, Transition}

/** flatMapGroupsWithState funnel: zero-to-many transition rows per key
  * per batch, monotone state across batches, intra-batch disorder
  * absorbed by event-order replay. */
class FunnelStreamSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("stage transitions emit once, in order, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = FunnelStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode(FunnelStream.outputMode).start()
    try {
      // batch 1: click arrives BEFORE view in arrival order but with a
      // later ts — replay order fixes it; duplicate view is idempotent
      mem.addData(
        Ev(1, t("2024-01-01 00:00:05"), 11, "click"),
        Ev(1, t("2024-01-01 00:00:01"), 10, "view"),
        Ev(1, t("2024-01-01 00:00:02"), 12, "view"),
        Ev(2, t("2024-01-01 00:00:01"), 20, "purchase"))
      q.processAllAvailable()
      val b1 = spark.table("funnel").as[Transition].collect()
      assert(b1.filter(_.user_id == 1).map(_.stage).sorted.toSeq == Seq("click", "view"))
      assert(b1.count(_.user_id == 2) == 0, "purchase without view+click is not a conversion")

      // batch 2: user 1 completes; user 2's view starts its funnel
      mem.addData(
        Ev(1, t("2024-01-01 00:01:00"), 13, "purchase"),
        Ev(2, t("2024-01-01 00:01:00"), 21, "view"))
      q.processAllAvailable()
      val b2 = spark.table("funnel").as[Transition].collect()
      assert(b2.count(r => r.user_id == 1 && r.stage == "purchase") == 1)
      assert(b2.count(r => r.user_id == 2 && r.stage == "view") == 1)

      // batch 3: replays and post-completion events emit nothing new
      mem.addData(
        Ev(1, t("2024-01-01 00:02:00"), 14, "view"),
        Ev(1, t("2024-01-01 00:02:01"), 15, "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel").count() == b2.length, "monotone state: no re-emission")
    } finally q.stop()
  }

  test("streaming transitions agree with the batch funnel on an in-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(5, t("2024-01-01 00:00:01"), 1, "view"),
      Ev(5, t("2024-01-01 00:00:02"), 2, "click"),
      Ev(5, t("2024-01-01 00:00:03"), 3, "purchase"),
      Ev(6, t("2024-01-01 00:00:01"), 4, "click"),
      Ev(6, t("2024-01-01 00:00:02"), 5, "view"))
    val mem = MemoryStream[Ev]
    val q = FunnelStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("funnel_twin")
      .outputMode(FunnelStream.outputMode).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val stream = spark.table("funnel_twin").as[Transition].collect()
        .groupBy(_.user_id).view.mapValues(_.map(_.stage).toSet).toMap
      // batch semantics (FunnelSpec): u5 full chain, u6 view only
      assert(stream(5L) == Set("view", "click", "purchase"))
      assert(stream(6L) == Set("view"))
    } finally q.stop()
  }
}

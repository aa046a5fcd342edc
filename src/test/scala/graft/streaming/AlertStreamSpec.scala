package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import AlertStream.{Alert, UserActivity}

/** transformWithState: conditional emission (zero or many rows per key
  * per batch), state accumulation across batches, and cold-start
  * suppression below the minimum history. */
class AlertStreamSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("spike alerts fire only after a baseline exists and only on spikes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[UserActivity]
    val q = AlertStream.spikes(mem.toDS())
      .writeStream.format("memory").queryName("alerts")
      .outputMode(AlertStream.outputMode).start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      // batch 1: user 1 builds a baseline (10, 10, 10); user 2 opens
      // with a huge value but has NO history — must not alert
      mem.addData(
        UserActivity(1, t("2024-01-01 00:00:01"), 10.0),
        UserActivity(1, t("2024-01-01 00:00:02"), 10.0),
        UserActivity(1, t("2024-01-01 00:00:03"), 10.0),
        UserActivity(2, t("2024-01-01 00:00:04"), 9999.0))
      q.processAllAvailable()
      assert(spark.table("alerts").count() == 0)

      // batch 2: user 1 spikes to 100 (> 3x mean 10) then returns to
      // baseline; the post-spike normal event must not alert even
      // though the spike inflated the running mean
      mem.addData(
        UserActivity(1, t("2024-01-01 00:01:00"), 100.0),
        UserActivity(1, t("2024-01-01 00:01:01"), 11.0))
      q.processAllAvailable()
      val alerts = spark.table("alerts").as[Alert].collect()
      assert(alerts.length == 1)
      val a = alerts.head
      assert(a.user_id == 1L && a.value == 100.0 && a.n_prior == 3L)
      assert(math.abs(a.baseline_mean - 10.0) < 1e-9)

      // batch 3: state persisted across batches — user 1's mean now
      // includes the spike ((30+100+11)/5 = 28.2); 80 < 3x28.2 = 84.6
      // stays quiet (and lifts the mean to 36.83), 120 > 110.5 alerts
      mem.addData(
        UserActivity(1, t("2024-01-01 00:02:00"), 80.0),
        UserActivity(1, t("2024-01-01 00:02:01"), 120.0))
      q.processAllAvailable()
      val all = spark.table("alerts").as[Alert].collect()
      assert(all.length == 2)
      assert(all.map(_.value).toSet == Set(100.0, 120.0))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}

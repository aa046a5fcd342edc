package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import AlertStream.{Alert, UserActivity}

/** transformWithState state survives a checkpointed stop/start: the
  * baseline learned before the restart decides an alert after it. */
class AlertRestartSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("RocksDB state restores across restart and drives post-restart alerts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("alert_ck").toString
    val out = Files.createTempDirectory("alert_out").toString
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def t(s: String) = Timestamp.valueOf(s)

    // the memory sink refuses checkpoint recovery; a parquet sink (and
    // therefore Append mode — fine, alerts are emit-once facts) is the
    // recoverable shape
    val mem1 = MemoryStream[UserActivity]
    def start(mem: MemoryStream[UserActivity]) =
      AlertStream.spikes(mem.toDS(),
        mode = org.apache.spark.sql.streaming.OutputMode.Append())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    val q1 = start(mem1)
    try {
      // build the baseline (mean 10 over 3 events), then stop
      mem1.addData(
        UserActivity(1, t("2024-01-01 00:00:01"), 10.0),
        UserActivity(1, t("2024-01-01 00:00:02"), 10.0),
        UserActivity(1, t("2024-01-01 00:00:03"), 10.0))
      q1.processAllAvailable()
      assert(spark.read.schema(
        "user_id LONG, ts TIMESTAMP, value DOUBLE, baseline_mean DOUBLE, n_prior LONG")
        .parquet(out).count() == 0)
    } finally q1.stop()

    // same source, same checkpoint: all pre-stop offsets were
    // committed, so the restart replays nothing — the only way the
    // spike below can alert is if the (n=3, mean=10) baseline was
    // RESTORED from RocksDB state
    val q2 = start(mem1)
    try {
      mem1.addData(UserActivity(1, t("2024-01-01 00:05:00"), 100.0))
      q2.processAllAvailable()
      val alerts = spark.read.parquet(out).as[Alert].collect()
      assert(alerts.length == 1, s"expected restored-state alert, got ${alerts.toSeq}")
      assert(alerts.head.n_prior == 3L && alerts.head.baseline_mean == 10.0)
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}

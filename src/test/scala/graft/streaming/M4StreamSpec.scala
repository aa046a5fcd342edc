package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class M4Evt(event_id: Long, value: Double, ts: Timestamp)

/** Streaming twin of the batch M4 downsampler's streamable core: the
  * min/max/count per tumbling bucket (first/last need a deterministic
  * in-window ORDER — not an append-mode streaming aggregate; a serving
  * layer derives them batch-side or via transformWithState). Parity is
  * asserted against the BATCH aggregation of the identical rows, so
  * the dashboard reducer can run incrementally with the same numbers. */
class M4StreamSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling min/max/count equals the batch reduction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[M4Evt]
    val agg = events.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "6 hours").as("w"))
      .agg(count(lit(1)).as("n_points"),
        min($"value").as("min_value"),
        max($"value").as("max_value"))
      .select($"w.start".as("bucket"), $"n_points", $"min_value",
        $"max_value")
    val q = agg.writeStream.format("memory")
      .queryName("m4_mem").outputMode("append").start()
    try {
      val windowA = Seq(
        M4Evt(1L, 3.5, t("2024-01-01 00:10:00")),
        M4Evt(2L, -1.25, t("2024-01-01 02:00:00")),
        M4Evt(3L, 9.75, t("2024-01-01 05:59:59")),
        M4Evt(4L, 0.5, t("2024-01-01 01:30:00")))
      events.addData(windowA: _*)
      q.processAllAvailable()
      assert(spark.table("m4_mem").isEmpty) // watermark not past 06:00
      // push the watermark beyond 06:00 + 1h delay; twice so eviction
      // runs after the watermark update takes effect
      events.addData(M4Evt(9L, 1.0, t("2024-01-01 08:30:00")))
      q.processAllAvailable()
      events.addData(M4Evt(10L, 2.0, t("2024-01-01 08:45:00")))
      q.processAllAvailable()
      val streamed = spark.table("m4_mem")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSet
      val batch = windowA.toDF()
        .groupBy(window($"ts", "6 hours").as("w"))
        .agg(count(lit(1)).as("n"), min($"value"), max($"value"))
        .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed ==
        Set((t("2024-01-01 00:00:00"), 4L, -1.25, 9.75)))
    } finally q.stop()
  }
}

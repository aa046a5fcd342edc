package graft.streaming

import java.sql.Timestamp
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming exact dedup over at-least-once delivery: replayed
  * envelopes (same sequence number) must not produce duplicate silver
  * rows, whether the replay lands in the same or a later micro-batch
  * within the watermark horizon. */
class StreamDedupSpec extends SparkSpec {

  private def json(seq: Long, flights: Double): String =
    s"""{"year":"2024","month":"1","carrier":"R-F","airport":"00",""" +
      s""""arr_flights":"$flights","arr_del15":"0.0","arr_delay":"0.0",""" +
      s""""produced_at":"$seq"}"""

  private def env(s: String, t: String): Envelope =
    Envelope(s.getBytes(UTF_8), Timestamp.valueOf(t))

  test("dropDuplicatesWithinWatermark: replays collapse to one row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Envelope]
    val deduped = SilverStream.dedupedSilver(
      SilverStream.silver(spark, mem.toDF()))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_mem").outputMode("append").start()
    try {
      // batch 1: two distinct + an in-batch duplicate of seq 1
      mem.addData(
        env(json(1, 10.0), "2024-01-01 00:00:10"),
        env(json(1, 10.0), "2024-01-01 00:00:11"),
        env(json(2, 20.0), "2024-01-01 00:00:20"))
      q.processAllAvailable()
      // batch 2: a cross-batch replay of seq 2 (within the watermark
      // horizon) + one genuinely new event
      mem.addData(
        env(json(2, 20.0), "2024-01-01 00:01:20"),
        env(json(3, 30.0), "2024-01-01 00:02:00"))
      q.processAllAvailable()
      val rows = spark.table("dedup_mem")
        .select($"produced_at", $"arr_flights").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    } finally q.stop()
  }
}

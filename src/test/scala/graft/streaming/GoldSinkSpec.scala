package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** T4+T6: the foreachBatch gold sink — complete-mode full refresh into
  * partitioned parquet, converging across micro-batches. */
class GoldSinkSpec extends SparkSpec {

  private def json(flights: Double, seq: Long, carrier: String = "R-F"): String =
    s"""{"year":"2024","month":"1","carrier":"$carrier","airport":"00",""" +
      s""""arr_flights":"$flights","arr_del15":"0.0","arr_delay":"1.0",""" +
      s""""produced_at":"$seq"}"""

  test("gold sink rewrites the aggregate table per batch, idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("goldsink").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("goldckpt").toFile.getAbsolutePath
    val mem = MemoryStream[Envelope]
    val gold = SilverStream.windowedGold(
      SilverStream.silver(spark, mem.toDF()))
    val q = SilverStream.goldSink(gold, dir, ckpt,
      Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Envelope(json(5, 1).getBytes(UTF_8),
        Timestamp.valueOf("2024-01-01 00:00:10")))
      q.processAllAvailable()
      val after1 = spark.read.parquet(dir)
        .agg(sum($"total_flights")).head.getDouble(0)
      assert(after1 == 5.0)
      // second batch: another carrier + more flights in the same window
      mem.addData(
        Envelope(json(7, 2).getBytes(UTF_8),
          Timestamp.valueOf("2024-01-01 00:01:10")),
        Envelope(json(11, 3, "N-O").getBytes(UTF_8),
          Timestamp.valueOf("2024-01-01 00:02:10")))
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
      // complete rewrite: totals reflect ALL data, nothing duplicated
      assert(out.agg(sum($"total_flights")).head.getDouble(0) == 23.0)
      assert(out.select($"carrier").distinct().count() == 2)
    } finally q.stop()
  }
}

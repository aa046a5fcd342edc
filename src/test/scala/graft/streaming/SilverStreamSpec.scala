package graft.streaming

import java.sql.Timestamp
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Envelope(body: Array[Byte], enqueuedTime: Timestamp)

/** Streaming tier tests over MemoryStream: stateless silver transform
  * (incl. truncated-capture repair), watermarked tumbling gold, and
  * incremental micro-batch behavior. */
class SilverStreamSpec extends SparkSpec {

  private def json(year: Int, flights: Double, seq: Long): String =
    s"""{"year":"$year","month":"1","carrier":"R-F","airport":"00",""" +
      s""""arr_flights":"$flights","arr_del15":"0.0","arr_delay":"1.5",""" +
      s""""produced_at":"$seq"}"""

  private def env(s: String, t: String): Envelope =
    Envelope(s.getBytes(UTF_8), Timestamp.valueOf(t))

  test("silver stream: parses clean rows, repairs noisy, drops truncated") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Envelope]
    val silver = SilverStream.silver(spark, mem.toDF())
    val q = silver.writeStream.format("memory")
      .queryName("silver_mem").outputMode("append").start()
    try {
      mem.addData(
        env(json(2024, 10, 1), "2024-01-01 00:00:10"),
        env(json(2024, 20, 2) + "<<<capture noise", "2024-01-01 00:01:10"),
        env(json(2024, 30, 3).dropRight(5), "2024-01-01 00:02:10"))
      q.processAllAvailable()
      val rows = spark.table("silver_mem")
        .select($"produced_at", $"arr_flights").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 10.0), (2L, 20.0)), "truncated row 3 must drop")
    } finally q.stop()
  }

  test("windowed gold: 5-minute tumbling windows per carrier, counts add up") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Envelope]
    val gold = SilverStream.windowedGold(SilverStream.silver(spark, mem.toDF()))
    val q = gold.writeStream.format("memory")
      .queryName("gold_mem").outputMode("complete").start()
    try {
      mem.addData(
        env(json(2024, 1, 1), "2024-01-01 00:00:30"),
        env(json(2024, 2, 2), "2024-01-01 00:04:30"), // same window
        env(json(2024, 4, 3), "2024-01-01 00:07:00")) // next window
      q.processAllAvailable()
      val rows = spark.table("gold_mem")
        .select($"window_start", $"n_rows", $"total_flights").collect()
        .map(r => (r.getAs[Timestamp](0).toString, r.getLong(1), r.getDouble(2)))
        .toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", 2L, 3.0),
        ("2024-01-01 00:05:00.0", 1L, 4.0)))
    } finally q.stop()
  }

  test("incremental micro-batches append, earlier results unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Envelope]
    val silver = SilverStream.silver(spark, mem.toDF())
    val q = silver.writeStream.format("memory")
      .queryName("silver_inc").outputMode("append").start()
    try {
      mem.addData(env(json(2024, 1, 1), "2024-01-01 00:00:10"))
      q.processAllAvailable()
      assert(spark.table("silver_inc").count() == 1)
      mem.addData(env(json(2024, 2, 2), "2024-01-01 00:00:20"))
      q.processAllAvailable()
      assert(spark.table("silver_inc").count() == 2)
      assert(spark.table("silver_inc").agg(sum($"arr_flights")).head.getDouble(0) == 3.0)
    } finally q.stop()
  }

  test("batch and stream silver produce union-compatible schemas") {
    val batchCols = graft.pipeline.SilverJson.silver(spark, sf0001)
      .schema.fieldNames.toSet
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Envelope]
    val streamCols = SilverStream.silver(spark, mem.toDF()).schema.fieldNames.toSet
    assert(batchCols.subsetOf(streamCols)) // stream adds enqueuedTime
  }
}

package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** T1 (paced producer source shape) + T2 (bronze capture file sink). */
class CaptureSpec extends SparkSpec {

  test("paced envelope source: streaming frame with the bronze shape (T1)") {
    val df = SilverStream.pacedEnvelopes(spark, rowsPerSecond = 5)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq ==
      Seq("body", "sequenceNumber", "enqueuedTime"))
    assert(df.schema("body").dataType.typeName == "binary")
    // the paced envelopes must parse through the same silver pipeline
    val silver = SilverStream.silver(spark, df)
    assert(silver.isStreaming)
    assert(silver.schema("arr_flights").dataType.typeName == "double")
  }

  test("bronze capture: envelopes land in parquet micro-batches (T2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("bronze").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("bronzeck").toFile.getAbsolutePath
    val mem = MemoryStream[Envelope]
    val q = SilverStream.bronzeCapture(mem.toDF(), dir, ckpt,
      Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(
        Envelope("""{"year":"2024"}""".getBytes(UTF_8),
          Timestamp.valueOf("2024-01-01 00:00:01")),
        Envelope("""{"year":"2025"}""".getBytes(UTF_8),
          Timestamp.valueOf("2024-01-01 00:00:02")))
      q.processAllAvailable()
      val captured = spark.read.parquet(dir)
      assert(captured.count() == 2)
      assert(captured.schema("body").dataType.typeName == "binary")
    } finally q.stop()
  }
}

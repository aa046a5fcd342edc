package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** T6 delivery semantics: a file-source silver stream stopped and
  * restarted from its checkpoint must process each input exactly once
  * (checkpoint offsets + append sink = no duplicates, no loss). */
class RestartSpec extends SparkSpec {

  test("checkpoint restart: exactly-once across stop/start") {
    import spark.implicits._
    val in = Files.createTempDirectory("restart_in").toFile.getAbsolutePath
    val out = Files.createTempDirectory("restart_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("restart_ck").toFile.getAbsolutePath

    def envFile(name: String, seqs: Range): Unit =
      seqs.map { i =>
        (s"""{"year":"2024","month":"1","carrier":"R-F","airport":"00",""" +
          s""""arr_flights":"1.0","arr_del15":"0.0","arr_delay":"0.0",""" +
          s""""produced_at":"$i"}""").getBytes("UTF-8")
      }.toDF("body")
        .withColumn("enqueuedTime", current_timestamp())
        .write.parquet(s"$in/$name")

    envFile("f1", 1 to 5)
    val schema = "body BINARY, enqueuedTime TIMESTAMP"
    def start() = {
      val env = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
      SilverStream.silver(spark, env)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 5)

    envFile("f2", 6 to 8)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 8, "no duplicates, no loss after restart")
    assert(rows.select($"produced_at").distinct().count() == 8)
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The V2 connector's STREAMING read half: the synthetic range served
  * as an admission-controlled micro-batch stream — rate-limited
  * triggers, offset checkpointing, and exactly-once delivery across a
  * mid-stream stop/restart onto the transactional file sink. */
class SyntheticStreamSpec extends SparkSpec {

  private val fmt = classOf[graft.sources.v2.SyntheticProvider].getName

  test("micro-batch stream drains the range in rate-limited batches, exactly once across restart") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("synthst_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("synthst_ck").toFile.getAbsolutePath
    def start(trigger: Option[org.apache.spark.sql.streaming.Trigger]) = {
      val w = spark.readStream.format(fmt)
        .option("rows", "1000").option("batchRows", "137").option("parts", "3")
        .load()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
      trigger.fold(w)(w.trigger).start()
    }

    // phase 1: let a few rate-limited batches commit, then stop
    // mid-stream. The 1 s processing-time trigger makes the stop
    // deterministic: draining all 1000 rows needs >= 8 trigger
    // intervals (~8 s) while the 200 ms poll observes the second
    // committed batch at ~2 s — the fast path can never complete
    // before the stop fires (the unthrottled variant raced: all 8
    // 137-row micro-batches could commit before the poll saw two).
    val q1 = start(Some(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second")))
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
      System.currentTimeMillis() < deadline) Thread.sleep(200)
    q1.stop()
    q1.awaitTermination()
    val afterStop = spark.read.parquet(outDir).count()
    assert(afterStop > 0 && afterStop < 1000,
      s"expected a genuine mid-stream stop, got $afterStop rows")

    // phase 2: restart from the checkpoint and drain (unthrottled)
    val q2 = start(None)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()

    // exactly-once: every id exactly once, content identical to batch
    val out = spark.read.parquet(outDir)
    assert(out.count() == 1000L)
    assert(out.select($"id").distinct().count() == 1000L)
    assert(out.agg(min($"id"), max($"id")).as[(Long, Long)].head() ==
      ((0L, 999L)))
    val bad = out.filter(
      $"val" =!= expr("(id * 37 % 1000) / 100.0") ||
        $"label" =!= concat(lit("L"), $"id" % 7)).count()
    assert(bad == 0, "streamed rows must match the deterministic row fn")
    // admission control really rate-limited: no batch exceeded batchRows
    val sizes = (q1.recentProgress ++ q2.recentProgress)
      .map(_.numInputRows).filter(_ > 0)
    assert(sizes.nonEmpty && sizes.forall(_ <= 137L),
      s"batch sizes $sizes exceeded the 137-row admission limit")
    assert(sizes.length >= 4, s"expected several rate-limited batches, got $sizes")
  }
}
